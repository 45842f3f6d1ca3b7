"""Multimodal column stages (image/audio/video as opaque binary).

The decode/feature-extract kernels are STUBBED — the image/audio
libraries are not in this container — but the Ray-side plumbing is
real and tested: schema contract, actor-pool signature, batch sizing
for wide binary rows, and deterministic fake decoding so the pipeline
shape can be exercised end-to-end.

Contract: a multimodal table carries `(item_id:string, payload:binary,
media_type:string, meta:string-json)`. Decode stages are actor pools
(model load once per actor) over small batches (payloads are wide —
batch_size must be set from payload size, not row count).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
        ("meta", pa.string()),
    ]
)


def synthetic_media_table(n_rows: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for exercising the plumbing."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n_rows)]
    kinds = [("image/png", {"w": 64, "h": 64}), ("audio/wav", {"sr": 16000, "sec": 1})]
    ids, types, metas = [], [], []
    for i in range(n_rows):
        t, m = kinds[i % len(kinds)]
        ids.append(f"item-{i:08d}")
        types.append(t)
        metas.append(json.dumps(m))
    return pa.table(
        {"item_id": ids, "payload": payloads, "media_type": types, "meta": metas},
        schema=MEDIA_SCHEMA,
    )


class ImageDecode:
    """Actor-pool stage: binary payload -> decoded feature vector.

    Real decode requires an image library (not in this container):
    pass `fake=True` for a deterministic content-derived fake feature
    (tested), else the stage raises NotImplementedError at first batch.
    """

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False):
        self.fake = fake
        if not fake:
            try:
                import PIL.Image  # noqa: F401  (absent here by design)

                self.pil = True
            except ImportError:
                self.pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            # the real codec path is a declared stub: raise whether or
            # not an image library is importable, so real payloads are
            # never silently run through the fake histogram
            raise NotImplementedError(
                "real image decode is not implemented"
                + ("" if getattr(self, "pil", False) else " (and PIL/opencv is not installed)")
                + "; use fake=True for the deterministic test double"
            )
        feats = []
        for payload in batch["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            # deterministic fake "embedding": bucketed byte histogram
            hist = np.bincount(arr >> 4, minlength=self.FEATURE_DIM)[: self.FEATURE_DIM]
            feats.append((hist / max(len(arr), 1)).astype(np.float32))
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))
        )


class ImageResize:
    """Actor-pool stage: resize the decoded image payload.

    Stubbed like ImageDecode: without an image library the fake mode
    byte-strides the payload down to (w*h*scale^2) deterministically;
    the meta JSON is updated with the new dimensions — the schema/actor
    plumbing is the real part.
    """

    def __init__(self, scale: float = 0.5, fake: bool = True):
        self.scale = scale
        self.fake = fake
        if not fake:
            # runtime-gate the real codec exactly like ImageDecode: the
            # stage constructs fine where PIL exists and raises a clear
            # NotImplementedError at first batch where it doesn't
            try:
                import PIL.Image  # noqa: F401  (absent here by design)

                self.pil = True
            except ImportError:
                self.pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real image resize is not implemented"
                + ("" if getattr(self, "pil", False) else " (and PIL/opencv is not installed)")
                + "; use fake=True for the deterministic test double"
            )
        out_payload, out_meta = [], []
        stride = max(int(round(1 / (self.scale**2))), 1)
        types = batch["media_type"].to_pylist() if "media_type" in batch.column_names else None
        for i, (payload, meta) in enumerate(
            zip(batch["payload"].to_pylist(), batch["meta"].to_pylist())
        ):
            # resize applies to image rows only; audio/video payloads
            # pass through untouched (a mixed media table must not have
            # its audio bytes decimated before frame sampling)
            if types is not None and not (types[i] or "").startswith("image"):
                out_payload.append(payload)
                out_meta.append(meta)
                continue
            out_payload.append(payload[::stride])
            m = json.loads(meta) if meta else {}
            for dim in ("w", "h"):
                if dim in m:
                    m[dim] = int(m[dim] * self.scale)
            out_meta.append(json.dumps(m))
        batch = batch.set_column(
            batch.column_names.index("payload"), "payload",
            pa.array(out_payload, type=pa.binary()),
        )
        return batch.set_column(
            batch.column_names.index("meta"), "meta", pa.array(out_meta, type=pa.string())
        )


class AudioFrameSample:
    """Actor-pool stage: sample N fixed-stride frames from an audio payload.

    Stubbed the same way: deterministic byte-stride sampling stands in
    for a real codec; the schema/actor/batch plumbing is the real part.
    """

    def __init__(self, n_frames: int = 4, frame_bytes: int = 256):
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames_col = []
        for payload in batch["payload"].to_pylist():
            n = len(payload)
            stride = max((n - self.frame_bytes) // max(self.n_frames - 1, 1), 1)
            frames = [
                payload[off : off + self.frame_bytes]
                for off in range(0, min(n, stride * self.n_frames), stride)
            ][: self.n_frames]
            frames_col.append(frames)
        return batch.append_column(
            "frames", pa.array(frames_col, type=pa.list_(pa.binary()))
        )


def decode_pipeline(
    ds,
    *,
    fake: bool = True,
    concurrency: int = 2,
    batch_size: int = 64,
    resize_scale: float | None = None,
):
    """[resize ->] image-decode + audio-frame-sample over a media dataset.

    batch_size is small on purpose: payload bytes x batch x concurrency
    must fit each actor's heap (wide-row rule). `resize_scale` inserts
    the ImageResize actor stage ahead of the decode (payload shrink
    before feature extraction)."""
    if resize_scale is not None:
        ds = ds.map_batches(
            ImageResize,
            fn_constructor_kwargs={"scale": resize_scale, "fake": fake},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        ImageDecode,
        fn_constructor_args=(fake,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).map_batches(
        AudioFrameSample,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
