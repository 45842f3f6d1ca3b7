"""Operator catalog: every engine op as a (Ray pipeline, DuckDB oracle) pair.

Each entry runs the REAL engine path (stats pass -> feature algebra ->
fit_distributed -> FeatureBackfill, or the dedicated stage) over the
driver's testdata parquet tables and names every computed column
exactly as the oracle SQL does, so the driver's order-insensitive
value-hash comparison is meaningful.

Float policy: single-element-wise IEEE ops (neg, +, -, *, /) are exact
across engines and ship unrounded; transcendentals (ln) and
order-dependent aggregates (sum/avg/std over many rows) are rounded on
BOTH sides (same literal in the SQL) to absorb last-ulp differences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.expr import binary, groupbythen, onehot, raw, unary
from ..stages.backfill import backfill_dataset
from ..stages.fit import fit_distributed
from ..stages.stats import base_features_from_stats, column_stats
from ..stages.temporal import asof_join, lag_lead, sessionize


_BIG_TABLES = {
    "lineitem", "orders", "events", "customer", "part", "supplier",
    # text/embedding tables are few-row but byte-heavy single files:
    # without splitting, every downstream text/dedup/ANN stage runs on
    # ONE block and serializes
    "documents", "embeddings",
}


def _table_schema(sf_dir: str, table: str, columns=None) -> pa.Schema:
    """The table's Arrow schema from parquet FILE metadata (no Ray
    execution), with the writer's pandas metadata stripped."""
    import pyarrow.parquet as pq

    s = pq.read_schema(f"{sf_dir}/{table}.parquet").remove_metadata()
    return pa.schema([s.field(c) for c in columns]) if columns else s


def _table_nrows(sf_dir: str, table: str) -> int:
    """Row count from parquet FILE metadata (no Ray execution) — the
    bucket-count hint for stages whose input is a map lineage that has
    lost its plan metadata count."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _q6(x):
    """Biased half-up 6dp quantizer shared by every operator: MUST stay
    token-identical to the SQL side's floor(x*1000000 + 0.5005)/1000000
    (round(x, 6) splits on numpy half-even vs DuckDB half-away at exact
    .5e-6 boundaries; the 0.0005 bias absorbs sub-ulp libm drift)."""
    return np.floor(x * 1e6 + 0.5005) / 1e6


def _exact_dot(a, b) -> int:
    """Overflow-proof integer dot product for driver-side moment folds
    (sum of a[i]*b[i] as a true arbitrary-precision int). numpy int64
    wraps SILENTLY on overflow while the SQL twins accumulate HUGEINT
    (DuckDB raises) — at very large scale the two engines would
    silently diverge instead of failing loudly. A worst-case bound
    check (n * |a|max * |b|max) picks the fast int64 kernel when
    provably safe at every prefix, else folds through Python ints via
    object dtype."""
    n = len(a)
    if n == 0:
        return 0
    amax = int(np.abs(a).max())
    bmax = int(np.abs(b).max())
    if amax * bmax * n < (1 << 62):
        return int(np.dot(a.astype(np.int64), b.astype(np.int64)))
    return int(np.dot(a.astype(object), b.astype(object)))


def _exact_sum(a) -> int:
    """Overflow-proof integer sum — same HUGEINT discipline as
    _exact_dot for plain sums of driver-side integer vectors."""
    n = len(a)
    if n == 0:
        return 0
    if int(np.abs(a).max()) * n < (1 << 62):
        return int(a.astype(np.int64).sum())
    return int(a.astype(object).sum())


def _guard_i64(bound: int, what: str) -> None:
    """Raise (like DuckDB's HUGEINT->BIGINT cast) instead of letting a
    distributed int64 fold wrap silently: callers pass the worst-case
    magnitude of a per-batch partial that downstream Ray Sum
    aggregates accumulate in int64."""
    if bound >= (1 << 62):
        raise OverflowError(
            f"{what}: worst-case partial {bound} would overflow the "
            "int64 exchange; rescale the units (the SQL twin would "
            "raise on its HUGEINT->BIGINT cast here too)"
        )


def _read(sf_dir: str, table: str, columns=None, split: bool | None = None, where=None):
    """Column-pruned parquet read. The test tables are single-row-group
    files, so Ray reads each as ONE block and every downstream map stage
    serializes; big fact tables are repartitioned to ~CPU blocks by
    default (split=None), tiny dimension tables are not.

    The explicit `schema=` (from file metadata, pandas metadata
    stripped) does three things at once: Ray's per-shuffle schema
    hashing works (the writer's pandas metadata dict is unhashable),
    `ds.schema()` is known WITHOUT executing the pipeline (a strip-
    metadata map_batches here used to make every schema probe a full
    scan — 6s per probe at sf0.1 inside t_asof / shuffle_hash_join),
    and the plan keeps its metadata row count so data-sized bucket
    hints survive.

    `where` (a pyarrow.compute expression) pushes the row filter INTO
    the scan: row groups whose statistics exclude the predicate are
    never read from storage — at 100 TB the difference between reading
    a slice and reading everything to throw most of it away. Columns
    the predicate references must be listed in `columns` (the scanner
    projects first); callers that don't want them downstream drop them
    with select_columns right after the read — a metadata-only
    projection, nothing ships through an exchange. Composes with the
    explicit schema=, so schema probes stay metadata-cheap; the plan's
    metadata row count is the PRE-filter count (an upper bound for
    bucket hints)."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet",
        columns=columns,
        schema=_table_schema(sf_dir, table, columns),
        **({"filter": where} if where is not None else {}),
    )
    if split or (split is None and table in _BIG_TABLES):
        ds = ds.repartition(max(16, int(ray.cluster_resources().get("CPU", 4))))
    return ds


def _round_cols(ds, cols: dict[str, int]):
    def f(batch: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            batch = batch.set_column(
                batch.column_names.index(c), c, pc.round(batch[c], ndigits=nd)
            )
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def _rename(ds, mapping: dict[str, str]):
    def f(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def _lineitem_features(sf_dir, plans_from, keep, rename, rounding=None, table="lineitem"):
    """stats -> build plans -> distributed fit -> backfill -> project."""
    stat_cols = plans_from["stats"]
    read_cols = sorted(set(keep) | set(stat_cols))
    ds = _read(sf_dir, table, columns=read_cols)
    stats = column_stats(ds.select_columns(stat_cols), stat_cols) if stat_cols else {}
    feats = {f.params[0]: f for f in base_features_from_stats(stats)} if stats else {}
    plans = plans_from["build"](feats)
    fitted = fit_distributed(plans, ds)
    out = backfill_dataset(ds, plans, fitted, keep_input=True)
    out = _rename(out, rename)
    if rounding:
        out = _round_cols(out, rounding)
    return out.select_columns(list(keep) + list(rename.values()))


# ---------------------------------------------------------------------------
# feature-algebra queries (engine kernels vs SQL oracle)


def fe_unary(sf_dir: str):
    def build(f):
        return [
            unary("log", f["l_extendedprice"]),
            unary("minus", f["l_quantity"]),
            unary("reciprocal", f["l_quantity"]),
        ]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_extendedprice", "l_quantity"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={
            "log(l_extendedprice)": "log_price",
            "(-1*l_quantity)": "neg_qty",
            "(1/l_quantity)": "recip_qty",
        },
        rounding={"log_price": 6},
    )


FE_UNARY_SQL = """
SELECT l_orderkey, l_linenumber,
       round(ln(l_extendedprice), 6) AS log_price,
       -l_quantity AS neg_qty,
       1.0 / l_quantity AS recip_qty
FROM lineitem
"""


def fe_scaling(sf_dir: str):
    def build(f):
        return [unary("minmax", f["l_quantity"]), unary("zscore", f["l_extendedprice"])]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_quantity", "l_extendedprice"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"minmax(l_quantity)": "qty_minmax", "zscore(l_extendedprice)": "price_z"},
        rounding={"qty_minmax": 6, "price_z": 6},
    )


def fe_npfun(sf_dir: str):
    """NumericFunction (arbitrary numpy ufunc by name, reference
    NumericFunctionTransformation.py) — sqrt/exp backfilled and
    hash-checked against the SQL builtins."""
    from ..functions.expr import npfunc

    def build(f):
        return [npfunc("sqrt", f["l_extendedprice"]), npfunc("exp", f["l_discount"])]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_extendedprice", "l_discount"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"np.sqrt(l_extendedprice)": "sqrt_price", "np.exp(l_discount)": "exp_disc"},
        rounding={"sqrt_price": 6, "exp_disc": 6},
    )


FE_NPFUN_SQL = """
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(exp(l_discount), 6) AS exp_disc
FROM lineitem
"""


def fe_winsorize(sf_dir: str):
    """Winsorize (quantile-clip) at the discrete [p05, p95]: fit is the
    mergeable weighted-value sketch (stages/fit.py — the impute_median
    path with a 64k-point per-partial cap), apply is a stateless clip.
    Values are unchanged or snapped to an existing value, so the compare
    is exact (no rounding) while per-block distinct counts stay under
    the cap (true at every test sf; bounded rank error beyond)."""
    from ..functions.expr import winsorize

    def build(f):
        return [winsorize(f["l_extendedprice"], 0.05, 0.95)]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_extendedprice"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"winsor[0.05,0.95](l_extendedprice)": "wins_price"},
    )


FE_WINSORIZE_SQL = """
WITH b AS (
    SELECT percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS lo,
           percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS hi
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       least(greatest(l_extendedprice, b.lo), b.hi) AS wins_price
FROM lineitem, b
"""


FE_SCALING_SQL = """
SELECT l_orderkey, l_linenumber,
       round((l_quantity - MIN(l_quantity) OVER ())
             / (MAX(l_quantity) OVER () - MIN(l_quantity) OVER ()), 6) AS qty_minmax,
       round((l_extendedprice - AVG(l_extendedprice) OVER ())
             / STDDEV_POP(l_extendedprice) OVER (), 6) AS price_z
FROM lineitem
"""


def fe_discretize(sf_dir: str):
    def build(f):
        return [unary("discretize", f["l_extendedprice"])]

    out = _lineitem_features(
        sf_dir,
        {"stats": ["l_extendedprice"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"discretize(l_extendedprice)": "price_bin"},
    )

    def to_int(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("price_bin")
        return batch.set_column(i, "price_bin", pc.cast(batch["price_bin"], pa.int32()))

    return out.map_batches(to_int, batch_format="pyarrow")


FE_DISCRETIZE_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(LEAST(GREATEST(CEIL((l_extendedprice - MIN(l_extendedprice) OVER ())
             / ((MAX(l_extendedprice) OVER () - MIN(l_extendedprice) OVER ()) / 10.0)) - 1,
             0), 9) AS INT) AS price_bin
FROM lineitem
"""


def fe_impute(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def derive(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64).copy()
        v[np.asarray(batch["event_type"].to_numpy(zero_copy_only=False)) == "error"] = np.nan
        return batch.append_column("v", pa.array(v, type=pa.float64()))

    ds = ds.map_batches(derive, batch_format="pyarrow")
    v = raw("v", properties={"missing_values": True})
    plan = unary("impute_mean", v)
    fitted = fit_distributed([plan], ds)
    out = backfill_dataset(ds, [plan], fitted)
    out = _rename(out, {"impute_mean(v)": "v_imputed"})
    out = _round_cols(out, {"v_imputed": 6})
    return out.select_columns(["event_id", "v_imputed"])


FE_IMPUTE_SQL = """
SELECT event_id,
       round(COALESCE(CASE WHEN event_type <> 'error' THEN value END,
             (SELECT AVG(CASE WHEN event_type <> 'error' THEN value END) FROM events)), 6)
           AS v_imputed
FROM events
"""


def fe_onehot(sf_dir: str):
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_returnflag"])
    flag = raw("l_returnflag", "categorical")
    plans = [onehot(flag, "R"), onehot(flag, "A")]
    out = backfill_dataset(ds, plans, {})
    out = _rename(out, {"onehot(l_returnflag=R)": "is_r", "onehot(l_returnflag=A)": "is_a"})

    def to_int(batch: pa.Table) -> pa.Table:
        for c in ("is_r", "is_a"):
            i = batch.column_names.index(c)
            batch = batch.set_column(i, c, pc.cast(batch[c], pa.int32()))
        return batch

    return out.map_batches(to_int, batch_format="pyarrow").select_columns(
        ["l_orderkey", "l_linenumber", "is_r", "is_a"]
    )


FE_ONEHOT_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r,
       CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS is_a
FROM lineitem
"""


def fe_groupbythen(sf_dir: str):
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"])
    q = raw("l_quantity", properties={"min": 1.0, "max": 50.0, "has_zero": False})
    flag = raw("l_returnflag", "categorical", {"distinct": 3})
    plans = [
        groupbythen("mean", q, flag),
        groupbythen("max", q, flag),
        groupbythen("std", q, flag),
        groupbythen("count", q, flag),
    ]
    fitted = fit_distributed(plans, ds)
    out = backfill_dataset(ds, plans, fitted)
    out = _rename(
        out,
        {
            "mean(l_quantity by l_returnflag)": "qty_mean_by_flag",
            "max(l_quantity by l_returnflag)": "qty_max_by_flag",
            "std(l_quantity by l_returnflag)": "qty_std_by_flag",
            "count(l_quantity by l_returnflag)": "qty_cnt_by_flag",
        },
    )
    out = _round_cols(out, {"qty_mean_by_flag": 6, "qty_std_by_flag": 6})
    return out.select_columns(
        ["l_orderkey", "l_linenumber", "qty_mean_by_flag", "qty_max_by_flag",
         "qty_std_by_flag", "qty_cnt_by_flag"]
    )


FE_GROUPBYTHEN_SQL = """
SELECT l_orderkey, l_linenumber,
       round(AVG(l_quantity) OVER (PARTITION BY l_returnflag), 6) AS qty_mean_by_flag,
       MAX(l_quantity) OVER (PARTITION BY l_returnflag) AS qty_max_by_flag,
       round(STDDEV_POP(l_quantity) OVER (PARTITION BY l_returnflag), 6) AS qty_std_by_flag,
       CAST(COUNT(l_quantity) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS qty_cnt_by_flag
FROM lineitem
"""


def fe_binary(sf_dir: str):
    def build(f):
        return [
            binary("add", f["l_quantity"], f["l_tax"]),
            binary("mul", f["l_quantity"], f["l_discount"]),
            binary("sub", f["l_extendedprice"], f["l_tax"]),
            binary("div", f["l_extendedprice"], f["l_quantity"]),
        ]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_quantity", "l_tax", "l_discount", "l_extendedprice"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={
            "(l_quantity+l_tax)": "qty_plus_tax",
            "(l_discount*l_quantity)": "qty_times_disc",
            "(l_extendedprice-l_tax)": "price_sub_tax",
            "(l_extendedprice/l_quantity)": "price_per_qty",
        },
    )


FE_BINARY_SQL = """
SELECT l_orderkey, l_linenumber,
       l_quantity + l_tax AS qty_plus_tax,
       l_quantity * l_discount AS qty_times_disc,
       l_extendedprice - l_tax AS price_sub_tax,
       l_extendedprice / l_quantity AS price_per_qty
FROM lineitem
"""


# ---------------------------------------------------------------------------
# relational / aggregate queries


def q_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("rev", rev)

    ds = ds.map_batches(revenue, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("rev", alias_name="sum_rev"),
        Mean("l_quantity", alias_name="avg_qty"),
        Count(alias_name="n"),
    )
    return _round_cols(out, {"sum_qty": 2, "sum_rev": 2, "avg_qty": 6})


Q_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_rev,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue(sf_dir: str):
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue_partial(batch: pa.Table) -> pa.Table:
        # combiner: per-batch partial sums before the shuffle — bounds
        # shuffle input at (batches x distinct keys in batch); the
        # reduction grows with key clustering / rows-per-key
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})
        return t.group_by("l_orderkey").aggregate([("rev", "sum")]).rename_columns(
            ["l_orderkey", "rev"]
        )

    # key-hash bucketing instead of a generic groupby over ~rows/4
    # distinct keys: Ray's hash aggregate pays per-key overheads, while
    # 64..data-sized buckets x (arrow group_by + local top-10 inside
    # map_groups) measured 5-8x faster at sf0.1 with identical output
    from ..stages.bucketing import default_buckets

    B = default_buckets(ds)

    def bucket_partial(batch: pa.Table) -> pa.Table:
        t = revenue_partial(batch)
        b = (t["l_orderkey"].to_numpy() % B).astype(np.int32)
        return t.append_column("__b", pa.array(b))

    def combine_top(g: pa.Table) -> pa.Table:
        t = (
            g.group_by("l_orderkey")
            .aggregate([("rev", "sum")])
            .rename_columns(["l_orderkey", "revenue"])
        )
        idx = pc.select_k_unstable(
            t, k=min(10, len(t)),
            sort_keys=[("revenue", "descending"), ("l_orderkey", "ascending")],
        )
        return t.take(idx)

    out = (
        ds.map_batches(bucket_partial, batch_format="pyarrow", batch_size=None)
        .groupby("__b")
        .map_groups(combine_top, batch_format="pyarrow")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
    )
    return _round_cols(out, {"revenue": 2})


Q_TOP_REVENUE_SQL = """
SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY l_orderkey
ORDER BY sum(l_extendedprice * (1.0 - l_discount)) DESC, l_orderkey
LIMIT 10
"""


def q_broadcast_join(sf_dir: str):
    """Small-side broadcast join: customer dim shipped once via ray.put,
    hash lookup inside map_batches — no shuffle of the fact table."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
        .sort_values("c_custkey", kind="stable")
    )
    # broadcast SORTED numpy arrays, not a Python dict: the object-store
    # read is zero-copy per task (a dict re-deserializes on every
    # ray.get) and the probe is a vectorized searchsorted, not per-row
    # Python hashing (VERDICT r1 item 6). The string values ship
    # DICTIONARY-ENCODED (int32 codes + a distinct-label array): every
    # per-row array in the broadcast is then numeric/zero-copy; only the
    # tiny label list (|distinct segments| elements) re-materializes per
    # ray.get.
    keys = cust["c_custkey"].to_numpy()
    codes, labels = pd.factorize(cust["c_mktsegment"])
    lookup_ref = ray.put(
        (keys, codes.astype(np.int32), np.asarray(labels, dtype=object))
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def attach(batch: pa.Table) -> pa.Table:
        from ..stages.arrowutil import sorted_lookup

        ks, cs, lab = ray.get(lookup_ref)
        idx, found = sorted_lookup(ks, batch["o_custkey"].to_numpy())
        seg = np.where(found, lab[cs[idx]], None)
        return batch.append_column("c_mktsegment", pa.array(seg, type=pa.string()))

    out = (
        orders.map_batches(attach, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="sum_total"))
    )
    return _round_cols(out, {"sum_total": 2})


Q_BROADCAST_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_semi_join(sf_dir: str):
    """Semi join via broadcast key set + vectorized filter."""
    import ray
    from ray.data.aggregate import Count

    keys = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"],
              where=pc.field("o_totalprice") > 150000.0)
        .to_pandas()["o_orderkey"]
        .to_numpy()
    )
    key_ref = ray.put(np.sort(keys))
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def semi(batch: pa.Table) -> pa.Table:
        from ..stages.arrowutil import sorted_lookup

        _, found = sorted_lookup(ray.get(key_ref), batch["l_orderkey"].to_numpy())
        return batch.filter(pa.array(found))

    return (
        ds.map_batches(semi, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Count(alias_name="n"))
    )


Q_SEMI_JOIN_SQL = """
SELECT l_returnflag, count(*) AS n
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0)
GROUP BY l_returnflag
"""


def q_anti_join(sf_dir: str):
    """Anti join (NOT IN) via the broadcast sorted-key-set pattern:
    customers with no high-value order, counted per market segment. No
    shuffle of either side; the key set ships once via ray.put."""
    import ray
    from ray.data.aggregate import Count

    keys = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
              where=pc.field("o_totalprice") > 400000.0)
        .to_pandas()["o_custkey"]
        .unique()
    )
    key_ref = ray.put(np.sort(keys))
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def anti(batch: pa.Table) -> pa.Table:
        from ..stages.arrowutil import sorted_lookup

        _, found = sorted_lookup(ray.get(key_ref), batch["c_custkey"].to_numpy())
        return batch.filter(pa.array(~found))

    return (
        ds.map_batches(anti, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_never_ordered"))
    )


Q_ANTI_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_never_ordered
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
GROUP BY c_mktsegment
"""


_PRICE_BANDS = [(0.0, 20000.0), (20000.0, 40000.0), (40000.0, 70000.0), (70000.0, 1e12)]


def q_range_join(sf_dir: str):
    """Range (band) join: each lineitem row joins the price band whose
    [lo, hi) interval contains l_extendedprice. The band table is tiny
    and SORTED, so the join is a broadcast searchsorted per batch — the
    custom-operator answer to an interval join that Ray Data lacks
    (partitioning assumption: the band table fits in the object store;
    the fact side streams)."""
    from ray.data.aggregate import Count, Sum

    lows = np.array([b[0] for b in _PRICE_BANDS])

    def band(batch: pa.Table) -> pa.Table:
        v = batch["l_extendedprice"].to_numpy()
        idx = np.searchsorted(lows, v, side="right") - 1
        return pa.table(
            {"band": pa.array(idx.astype(np.int64)), "price": batch["l_extendedprice"]}
        )

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    out = (
        ds.map_batches(band, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Count(alias_name="n"), Sum("price", alias_name="sum_price"))
    )
    return _round_cols(out, {"sum_price": 2})


Q_RANGE_JOIN_SQL = """
SELECT b.band, count(*) AS n, round(sum(l.l_extendedprice), 2) AS sum_price
FROM lineitem l
JOIN (VALUES (0, 0.0, 20000.0), (1, 20000.0, 40000.0),
             (2, 40000.0, 70000.0), (3, 70000.0, 1e12)) AS b(band, lo, hi)
  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
"""


def q_distinct_parts(sf_dir: str):
    """Per-flag exact distinct part count via the set-union combiner —
    no row shuffle; only per-batch (group -> value set) summaries move
    (stages/sketch.py; HLL variant for unbounded cardinalities)."""
    from ..stages.sketch import distinct_exact

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])
    return distinct_exact(
        ds, key_cols=["l_returnflag"], value_col="l_partkey", out_col="n_parts"
    )


Q_DISTINCT_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
FROM lineitem
GROUP BY l_returnflag
"""


def q_union_distinct(sf_dir: str):
    """Row-level set op: UNION (ALL + distinct) of two key projections
    — Dataset.union then the exact-dedup shuffle, counted per flag."""
    from ray.data.aggregate import Count

    hi = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_quantity"],
        where=pc.field("l_quantity") >= 45.0,
    )
    lo = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_quantity"],
        where=pc.field("l_quantity") <= 5.0,
    )

    def proj(batch: pa.Table) -> pa.Table:
        return batch.select(["l_orderkey", "l_returnflag"])

    both = hi.map_batches(proj, batch_format="pyarrow").union(
        lo.map_batches(proj, batch_format="pyarrow")
    )

    # distinct via key-hash buckets + per-bucket arrow dedup (cheaper
    # than a generic 2-column groupby over ~every key; see q_top_revenue)
    from ..stages.bucketing import default_buckets

    # hi/lo are .filter() lineages with no metadata count; size the
    # buckets from the UNFILTERED parquet read's metadata (an upper
    # bound — errs toward more buckets, keeping per-bucket memory
    # bounded as the data grows) rather than falling back to the CPU
    # floor.
    B = default_buckets(_read(sf_dir, "lineitem", columns=["l_orderkey"], split=False))

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["l_orderkey"].to_numpy() % B).astype(np.int32)
        return batch.append_column("__b", pa.array(b))

    def dedup_bucket(g: pa.Table) -> pa.Table:
        return (
            g.select(["l_orderkey", "l_returnflag"])
            .group_by(["l_orderkey", "l_returnflag"])
            .aggregate([])
        )

    return (
        both.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(dedup_bucket, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Count(alias_name="n_keys"))
    )


Q_UNION_DISTINCT_SQL = """
SELECT l_returnflag, count(*) AS n_keys FROM (
    SELECT DISTINCT l_orderkey, l_returnflag FROM (
        SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity >= 45.0
        UNION ALL
        SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity <= 5.0
    )
) GROUP BY l_returnflag
"""


def q_shuffle_join(sf_dir: str):
    """Large x large partitioned equi-join: lineitem JOIN orders on the
    order key via the bucketed shuffle hash join (stages/partition.py:
    shuffle_hash_join — both sides hash-partition into shared data-sized
    buckets, pyarrow C++ hash join per bucket, neither side broadcast),
    then revenue per order priority. The join for two fact tables; the
    broadcast family (q_broadcast_join etc.) covers the small-side case."""
    from ray.data.aggregate import Sum

    from ..stages.partition import shuffle_hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = shuffle_hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey")

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return pa.table({"o_orderpriority": batch["o_orderpriority"], "__r": r})

    out = (
        joined.map_batches(rev, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("__r", alias_name="revenue"))
    )
    return _round_cols(out, {"revenue": 2})


def q_skew_join(sf_dir: str):
    """Skew-aware join: exact LEFT key-count pass routes hot keys
    (here: customers with > 12 orders) to a broadcast pyarrow join and
    the cold tail through the bucketed shuffle join
    (stages/partition.py:skew_join) — the answer to shuffle_hash_join's
    documented hot-key straggler. Result is the exact inner join, so
    the SQL oracle is a plain JOIN."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    from ..stages.partition import skew_join

    joined = skew_join(
        orders, cust, left_on="o_custkey", right_on="c_custkey", hot_threshold=12
    )
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="sum_price"))
    )
    return _round_cols(out, {"sum_price": 2})


Q_SKEW_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


Q_SHUFFLE_JOIN_SQL = """
SELECT o_orderpriority, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_approx_distinct(sf_dir: str):
    """Per-flag APPROXIMATE distinct part count via HyperLogLog register
    partials (stages/sketch.py:distinct_hll — O(groups x 2^p) bytes move,
    zero row shuffle; the 100TB path where the exact set-union combiner's
    driver memory would blow up). The value hash is the replayable
    degree-2 polynomial family (_hash61), so the SQL oracle rebuilds
    every register and reproduces the ~1.6%-error ESTIMATE exactly —
    deterministic public randomness makes an approximate sketch
    value-verifiable. Pytest keeps the within-5%-of-exact envelope."""
    from ..stages.sketch import distinct_hll

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])
    out = distinct_hll(
        ds, key_cols=["l_returnflag"], value_col="l_partkey", p=12, out_col="n_approx"
    )
    out["n_approx"] = np.floor(out["n_approx"] * 1e6 + 0.5005) / 1e6
    return out


Q_APPROX_DISTINCT_SQL = """
WITH v AS (
  SELECT DISTINCT l_returnflag AS flag,
         CAST(l_partkey AS HUGEINT) % 2305843009213693951 AS x
  FROM lineitem),
x1 AS (
  SELECT flag,
         (x + 167772161) % 2305843009213693951
           * 1152921504606846883 % 2305843009213693951 AS x1
  FROM v),
h AS (
  SELECT flag,
         CAST(((x1 * x1 % 2305843009213693951) * 998244353 % 2305843009213693951
               + x1 * 754974721 % 2305843009213693951
               + 167772161) % 2305843009213693951 AS BIGINT) AS h
  FROM x1),
b AS (SELECT flag, h // 562949953421312 AS reg, h % 562949953421312 AS rest FROM h),
rk AS (
  SELECT flag, reg,
         max(CASE WHEN rest = 0 THEN 50 ELSE 49 - length(bin(rest)) + 1 END) AS rnk
  FROM b GROUP BY flag, reg),
grid AS (
  SELECT f.flag, g.reg
  FROM (SELECT DISTINCT l_returnflag AS flag FROM lineitem) f
  CROSS JOIN (SELECT unnest(generate_series(0, 4095)) AS reg) g),
regs AS (
  SELECT grid.flag, COALESCE(rk.rnk, 0) AS rnk
  FROM grid LEFT JOIN rk ON grid.flag = rk.flag AND grid.reg = rk.reg),
s AS (
  SELECT flag, SUM(pow(2.0, -rnk)) AS ssum,
         SUM(CASE WHEN rnk = 0 THEN 1 ELSE 0 END) AS zeros
  FROM regs GROUP BY flag),
est AS (
  SELECT flag,
         CASE WHEN (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 / ssum <= 2.5 * 4096
                   AND zeros > 0
              THEN 4096 * ln(4096 / zeros)
              ELSE (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 / ssum END AS e
  FROM s)
SELECT flag AS l_returnflag,
       floor(e * 1000000 + 0.5005) / 1000000 AS n_approx
FROM est ORDER BY l_returnflag
"""


def q_filter_sort_topk(sf_dir: str):
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"],
    )
    ds = ds.map_batches(
        lambda t: t.filter(pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01")))),
        batch_format="pyarrow",
    )
    return (
        ds.sort(["l_extendedprice", "l_orderkey", "l_linenumber"], descending=[True, False, False])
        .limit(15)
        .select_columns(["l_orderkey", "l_linenumber", "l_extendedprice"])
    )


Q_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1997-01-01'
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 15
"""


# ---------------------------------------------------------------------------
# temporal queries over events


def t_lag_lead(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)
    out = lag_lead(
        ds, key="user_id", ts="ts", cols=["value"], lags=(1,), leads=(1,),
        tiebreak=["event_id"],
    )
    return out.select_columns(["event_id", "value_lag1", "value_lead1"])


T_LAG_LEAD_SQL = """
SELECT event_id,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lag1,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lead1
FROM events
"""


def t_sessionize(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"], split=True)
    out = sessionize(
        ds, key="user_id", ts="ts", gap=1800, tiebreak=["event_id"]
    )
    return out.select_columns(["event_id", "session_idx"])


T_SESSIONIZE_SQL = """
SELECT event_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1
           AS BIGINT) AS session_idx
FROM (
    SELECT event_id, user_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
)
"""


def t_asof(sf_dir: str):
    """Latest prior purchase value attached to every click, per user —
    the point-in-time join with zero leakage."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"], split=True)
    clicks = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("click"))).select(
            ["event_id", "ts", "user_id"]
        ),
        batch_format="pyarrow",
    )
    purchases = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("purchase"))),
        batch_format="pyarrow",
    )

    # dedup the event side per (user, ts): keep the max-event_id row.
    # grouped_map = one call per hash bucket, not one per user
    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable")
        return g.groupby(["user_id", "ts"], sort=False).tail(1)[["user_id", "ts", "value"]]

    from ..stages.bucketing import default_buckets
    from ..stages.temporal import grouped_map

    # the filtered sides are lazy map lineages with no metadata row
    # count; size the hash buckets from the SOURCE read instead
    nb = default_buckets(ds)
    purchases = grouped_map(purchases, "user_id", dedup, num_buckets=nb)
    # likewise derive both schemas from the parquet read's metadata so
    # asof_join doesn't execute each pipeline an extra time just to
    # discover column types
    base = {n: t for n, t in zip(ds.schema().names, ds.schema().types)}
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        probe_ts="ts",
        event_ts="ts",
        value_cols=["value"],
        num_buckets=nb,
        probe_schema=pa.schema([(c, base[c]) for c in ["event_id", "ts", "user_id"]]),
        event_schema=pa.schema([(c, base[c]) for c in ["user_id", "ts", "value"]]),
    )
    return out.select_columns(["event_id", "asof_value"])


T_ASOF_SQL = """
SELECT c.event_id, p.value AS asof_value
FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (
    SELECT user_id, ts, arg_max(value, event_id) AS value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
) p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def t_asof_nearest(sf_dir: str):
    """Nearest-event join (same probe/event construction as t_asof, but
    |Δt|-minimizing instead of point-in-time): for every click, the
    purchase value closest in time either direction, equidistant ties
    resolving to the EARLIER purchase (see stages/temporal.py:asof_join
    direction='nearest'). Same single entity-bucket exchange as the
    backward join — the nearest pick is two sorted-merge cursors per
    bucket, not a second shuffle."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"], split=True)
    clicks = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("click"))).select(
            ["event_id", "ts", "user_id"]
        ),
        batch_format="pyarrow",
    )
    purchases = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("purchase"))),
        batch_format="pyarrow",
    )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable")
        return g.groupby(["user_id", "ts"], sort=False).tail(1)[["user_id", "ts", "value"]]

    from ..stages.bucketing import default_buckets
    from ..stages.temporal import grouped_map

    nb = default_buckets(ds)
    purchases = grouped_map(purchases, "user_id", dedup, num_buckets=nb)
    base = {n: t for n, t in zip(ds.schema().names, ds.schema().types)}
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        probe_ts="ts",
        event_ts="ts",
        value_cols=["value"],
        num_buckets=nb,
        probe_schema=pa.schema([(c, base[c]) for c in ["event_id", "ts", "user_id"]]),
        event_schema=pa.schema([(c, base[c]) for c in ["user_id", "ts", "value"]]),
        direction="nearest",
    )
    return out.select_columns(["event_id", "asof_value"])


T_ASOF_NEAREST_SQL = """
WITH c AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts, arg_max(value, event_id) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
b AS (SELECT c.event_id, c.ts AS cts, p.ts AS bts, p.value AS bval
      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts),
f AS (SELECT c.event_id, p.ts AS fts, p.value AS fval
      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts)
SELECT b.event_id,
       CASE WHEN fts IS NOT NULL AND (bts IS NULL OR (fts - cts) < (cts - bts))
            THEN fval ELSE bval END AS asof_value
FROM b JOIN f USING (event_id)
"""


def d_ccnet_buckets(sf_dir: str):
    """CCNet-style head/middle/tail bucketing: per-language tercile
    cutpoints of a doc score (mean word length here — the same
    int/int division in both engines, so scores agree bit-for-bit),
    cutpoints from ONE mergeable-sketch pass
    (stages/sketch.py:grouped_quantiles, percentile_disc semantics so
    every cutpoint IS a data value — no interpolation arithmetic to
    disagree about), then a broadcast cutpoint map buckets the stream
    and per-(lang, bucket) partials aggregate. The standard corpus
    stratification before mixture sampling."""
    from ray.data.aggregate import Sum

    from ..stages.sketch import grouped_quantiles

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def score(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        n_words = s.str.count(r"\S+").to_numpy(np.int64)
        sc = s.str.len().to_numpy(np.int64) / np.maximum(n_words, 1)
        return pa.table({"lang": batch["lang"], "score": pa.array(sc)})

    scored = ds.map_batches(score, batch_format="pyarrow")
    cuts = grouped_quantiles(
        scored, key_cols=["lang"], value_col="score",
        qs=[1.0 / 3.0, 2.0 / 3.0], out_cols=["c1", "c2"],
    )
    c1 = dict(zip(cuts["lang"], cuts["c1"]))
    c2 = dict(zip(cuts["lang"], cuts["c2"]))

    def bucket(batch: pa.Table) -> pa.Table:
        lang = pd.Series(batch["lang"].to_pandas())
        sc = batch["score"].to_numpy()
        lo = lang.map(c1).to_numpy(np.float64)
        hi = lang.map(c2).to_numpy(np.float64)
        b = np.where(sc <= lo, "head", np.where(sc <= hi, "middle", "tail"))
        part = pd.DataFrame({"lang": lang, "bucket": b, "n_docs": 1, "score_sum": sc})
        agg = part.groupby(["lang", "bucket"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (
        scored.map_batches(bucket, batch_format="pyarrow")
        .groupby(["lang", "bucket"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("score_sum", alias_name="score_sum"))
        .to_pandas()
    )
    # scores are dyadic quotients (len/wc), so their mean can land
    # exactly on a .5e-6 boundary where numpy and DuckDB round apart —
    # biased half-up quantizer in both engines (see T_EWMA_SQL)
    avg = out.pop("score_sum") / out["n_docs"]
    out["avg_score"] = np.floor(avg * 1e6 + 0.5005) / 1e6
    return out.sort_values(["lang", "bucket"]).reset_index(drop=True)


D_CCNET_BUCKETS_SQL = """
WITH s AS (
  SELECT lang,
         length(text) * 1.0
           / greatest(len(regexp_extract_all(text, '\\S+')), 1) AS score
  FROM documents),
c AS (
  SELECT lang,
         percentile_disc(0.3333333333333333) WITHIN GROUP (ORDER BY score) AS c1,
         percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY score) AS c2
  FROM s GROUP BY lang),
b AS (
  SELECT s.lang,
         CASE WHEN score <= c1 THEN 'head'
              WHEN score <= c2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         score
  FROM s JOIN c USING (lang))
SELECT lang, bucket, count(*) AS n_docs,
       floor(avg(score) * 1000000 + 0.5005) / 1000000 AS avg_score
FROM b GROUP BY lang, bucket ORDER BY lang, bucket
"""


# ---------------------------------------------------------------------------
# curation queries over documents / embeddings


def d_exact_dedup(sf_dir: str):
    from ..stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id"])


D_EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
"""


def d_token_counts(sf_dir: str):
    from ..stages.text import token_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_counts, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens_ws"]
    )


D_TOKEN_COUNTS_SQL = """
SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens_ws FROM documents
"""


def d_fertility(sf_dir: str):
    """Tokenizer fertility per (source, lang): BPE-ish subword tokens
    per whitespace word, as the ratio of per-group SUMS (robust to
    zero-word docs). Per-batch (group, Σbpe, Σws) partials bound the
    exchange to O(groups); the quotient of int sums is dyadic-capable,
    so both engines use the biased half-up quantizer."""
    from ray.data.aggregate import Sum

    from ..stages.text import token_counts

    ds = _read(sf_dir, "documents", columns=["text", "source", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        t = token_counts(batch)
        df = pd.DataFrame({
            "source": t["source"].to_pandas(),
            "lang": t["lang"].to_pandas(),
            "ws": t["n_tokens_ws"].to_numpy(),
            "bpe": t["n_tokens_bpe"].to_numpy(),
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "lang"], as_index=False).sum(),
            preserve_index=False,
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("ws", alias_name="ws"), Sum("bpe", alias_name="bpe"))
        .to_pandas()
    )
    fert = out["bpe"] / np.maximum(out["ws"], 1)
    out["fertility"] = np.floor(fert * 1e6 + 0.5005) / 1e6
    return out.sort_values(["source", "lang"]).reset_index(drop=True)


D_FERTILITY_SQL = """
SELECT source, lang,
       CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS ws,
       CAST(sum(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe,
       floor(sum(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) * 1.0
            / greatest(sum(len(regexp_extract_all(text, '\\S+'))), 1)
            * 1000000 + 0.5005) / 1000000 AS fertility
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


def d_quality(sf_dir: str):
    from ..stages.text import quality_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(quality_scores, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_words", "punct_ratio", "digit_ratio", "mean_word_len"])


D_QUALITY_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+')) AS n_words,
       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
           / greatest(length(text), 1) AS punct_ratio,
       length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
           / greatest(length(text), 1) AS digit_ratio,
       length(text) * 1.0 / greatest(len(regexp_extract_all(text, '\\S+')), 1) AS mean_word_len
FROM documents
"""


def d_repetition(sf_dir: str):
    """Gopher-style within-document repetition quality signals
    (duplicate-word fraction + top-word fraction), exact vs the SQL
    word-frequency oracle."""
    from ..stages.text import repetition_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(repetition_stats, batch_format="pyarrow")
    out = _round_cols(out, {"dup_word_frac": 6, "top_word_frac": 6})
    return out.select_columns(["doc_id", "dup_word_frac", "top_word_frac"])


D_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents
),
c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
p AS (
  SELECT doc_id, sum(c) * 1.0 AS total, count(*) * 1.0 AS distinct_w, max(c) * 1.0 AS top
  FROM c GROUP BY doc_id
)
SELECT d.doc_id,
       round(COALESCE(1.0 - p.distinct_w / p.total, 0.0), 6) AS dup_word_frac,
       round(COALESCE(p.top / p.total, 0.0), 6) AS top_word_frac
FROM documents d LEFT JOIN p USING (doc_id)
"""


def d_pii(sf_dir: str):
    """PII email/phone scan: deterministic synthetic PII is injected
    into every 5th document (the test tables carry none), then the
    vectorized regex counter runs; the oracle applies the SAME injection
    and RE2-compatible patterns in DuckDB."""
    from ..stages.text import pii_scan

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        suffix = pd.Series(
            [
                f" contact u{i}@ex.com call 555-123-4567" if i % 5 == 0 else ""
                for i in ids
            ]
        )
        t = (s + suffix).to_numpy(dtype=object)
        return batch.set_column(
            batch.column_names.index("text"), "text", pa.array(t, type=pa.string())
        )

    out = ds.map_batches(inject, batch_format="pyarrow").map_batches(
        pii_scan, batch_format="pyarrow"
    )
    return out.select_columns(["doc_id", "n_emails", "n_phones"])


D_PII_SQL = """
WITH injected AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com call 555-123-4567'
                      ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text, '\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}')) AS n_phones
FROM injected
"""


def d_mixture_sample(sf_dir: str):
    """Deterministic source-weighted mixture sampling (DoReMi / Pile
    style source re-weighting): rate per source from the arithmetic
    rule idx%4 -> {1.0, 0.5, 0.25, 0.1}, decided row-locally by a
    multiplicative hash of doc_id — a pure streaming filter whose exact
    predicate the SQL oracle replays."""
    from ..stages.sampling import mixture_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    sources = [r["source"] for r in ds.groupby("source").count().take_all()]
    rate_of = [1.0, 0.5, 0.25, 0.1]
    rates = {s: rate_of[int(s[3:]) % 4] for s in sources}
    return mixture_sample(ds, rates, key_col="doc_id", group_col="source", seed=17)


D_MIXTURE_SAMPLE_SQL = """
SELECT doc_id, source FROM documents
WHERE ((doc_id * 2710938419 + 17) % 4294967296) % 10000 <
      CASE (CAST(substr(source, 4) AS INTEGER) % 4)
           WHEN 0 THEN 10000 WHEN 1 THEN 5000 WHEN 2 THEN 2500 ELSE 1000 END
"""


def d_det_shuffle(sf_dir: str):
    """Deterministic seeded global shuffle of the corpus (the
    training-output ordering pass): hash sort key -> global sort ->
    head. Reproducible across runs and cluster sizes, unlike
    random_shuffle; verified by the oracle re-deriving the same order."""
    from ..stages.sampling import deterministic_shuffle_key

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    keyed = deterministic_shuffle_key(ds, key_col="doc_id", seed=29, out_col="shuffle_key")
    return keyed.sort("shuffle_key").limit(100)


D_DET_SHUFFLE_SQL = """
SELECT doc_id, (doc_id * 1992887243 + 29) % 4294967296 AS shuffle_key
FROM documents ORDER BY shuffle_key LIMIT 100
"""


def d_dup_passages(sf_dir: str):
    """Corpus-level duplicated word-5-gram fraction per document (the
    Lee-et-al substring-dedup measurement); the oracle rebuilds the
    5-gram occurrence table in SQL and counts repeats."""
    from ..stages.dedup import dup_passages

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dup_passages(ds, shingle_words=5)


D_DUP_PASSAGES_SQL = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ws) - 4, 0)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]
         )) AS sh
  FROM w
),
c AS (SELECT sh, count(*) AS c FROM g GROUP BY sh)
SELECT doc_id, count(*) AS n_shingles,
       round(sum(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS dup_frac
FROM g JOIN c USING (sh) GROUP BY doc_id
"""


def d_grouped_topn(sf_dir: str):
    """Keep the 3 longest documents per source (the per-domain
    best-of-N curation cut). Per-batch local top-n combiner bounds the
    exchange at n rows per (batch, group); ties break on doc_id."""
    from ..stages.sampling import grouped_topn

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return grouped_topn(
        ds, key_col="source", order_col="n_chars", n=3, descending=True,
        tiebreak_col="doc_id",
    )


D_GROUPED_TOPN_SQL = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn <= 3
"""


def d_quantile_filter(sf_dir: str):
    """Quantile-threshold filter: keep documents above the corpus-wide
    discrete p90 of n_chars. The threshold comes from the mergeable
    weighted-value sketch (one streaming pass, O(batches x sketch_k)
    summary bytes to the driver); the filter is a second streaming
    pass against the broadcast scalar — a data-dependent predicate
    costs exactly two passes, never a materialization."""
    import pyarrow.compute as pc_

    from ..stages.sketch import grouped_quantile

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def const_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", pa.array(np.zeros(batch.num_rows, np.int64)))

    thr = grouped_quantile(
        ds.map_batches(const_key, batch_format="pyarrow"),
        key_cols=["__g"], value_col="n_chars", q=0.9, out_col="p90",
    )["p90"].iloc[0]

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc_.greater(batch["n_chars"], pa.scalar(float(thr))))

    return ds.map_batches(keep, batch_format="pyarrow")


D_QUANTILE_FILTER_SQL = """
SELECT doc_id, n_chars FROM documents
WHERE n_chars > (SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)
                 FROM documents)
"""


def t_tumbling(sf_dir: str):
    """Tumbling 1-hour window aggregate per user over the event stream
    (the windowed-aggregate family's fixed-window member; rolling/RANGE
    and sessionization are its siblings in `stages/temporal.py`)."""
    from ..stages.temporal import tumbling_agg

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    return tumbling_agg(ds, key="user_id", ts="ts", value="value", width_s=3600)


T_TUMBLING_SQL = """
SELECT user_id, epoch_us(ts) // 3600000000 AS win,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY user_id, epoch_us(ts) // 3600000000
"""


def t_ohlc(sf_dir: str):
    """Per-user hourly OHLC downsample of event values (open/high/low/
    close + count; ties broken by event_id so first/last are total).
    Mergeable-cell combiner: the exchange carries one cell per
    (user, hour), never raw events — see stages/temporal.py:ohlc_agg.
    open/close/high/low are exact data values, so no float rounding is
    needed for the oracle."""
    from ..stages.temporal import ohlc_agg

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)
    out = ohlc_agg(ds, key="user_id", ts="ts", value="value",
                   width_s=3600, order_col="event_id")
    return out.to_pandas().sort_values(["user_id", "win"]).reset_index(drop=True)


T_OHLC_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS win, ts, event_id, value
  FROM events)
SELECT DISTINCT user_id, win,
       first_value(value) OVER w AS open,
       max(value) OVER (PARTITION BY user_id, win) AS high,
       min(value) OVER (PARTITION BY user_id, win) AS low,
       last_value(value) OVER (PARTITION BY user_id, win ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close,
       count(*) OVER (PARTITION BY user_id, win) AS n_events
FROM e
WINDOW w AS (PARTITION BY user_id, win ORDER BY ts, event_id)
ORDER BY user_id, win
"""


def t_hopping(sf_dir: str):
    """Hopping 1-hour window advancing every 20 minutes per user (the
    sliding-window member of the windowed-aggregate family): row-local
    3x explode + partially-combined hash aggregate — per-window
    partials shuffle, not events."""
    from ..stages.temporal import hopping_agg

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    # sparse user-activity windows + small m=3: the bucket strategy
    # (one raw-event shuffle, local explode+aggregate) measured 3.4x
    # faster than shipping uncombined exploded partials
    return hopping_agg(
        ds, key="user_id", ts="ts", value="value", width_s=3600, hop_s=1200,
        mode="bucket",
    )


T_HOPPING_SQL = """
SELECT user_id, (epoch_us(ts) // 1200000000) - k AS win,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
GROUP BY user_id, win
"""


def d_top_tokens(sf_dir: str):
    """Exact corpus-wide heavy hitters: the 25 most frequent tokens
    with exact counts (vocab-sized aggregate + per-block local top-k
    prefilter + tiny global sort; ties break on token text)."""
    from ..stages.text import top_tokens

    ds = _read(sf_dir, "documents", columns=["text"])
    return top_tokens(ds, k=25)


D_TOP_TOKENS_SQL = """
WITH u AS (SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents)
SELECT token, count(*) AS c FROM u GROUP BY token
ORDER BY c DESC, token LIMIT 25
"""


def d_lm_score(sf_dir: str):
    """CCNet-style bigram-LM perplexity scoring: fit the add-alpha
    bigram model on the corpus in one streaming pass (per-batch
    distinct-count partials -> one Ray aggregate over distinct n-grams,
    model O(vocab) on the driver), broadcast it once, score every
    document streaming. The oracle rebuilds the same counts and the
    same smoothed log-likelihood in SQL."""
    from ..stages.lm import fit_bigram_lm, score_bigram_lm

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lm = fit_bigram_lm(ds, alpha=0.5)
    return score_bigram_lm(ds, lm)


D_LM_SCORE_SQL = """
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents),
u AS (SELECT unnest(ws) AS t FROM w),
uc AS (SELECT t, count(*) AS c FROM u GROUP BY t),
v AS (SELECT count(*) AS v FROM uc),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS b,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                               i -> ws[i])) AS w1
  FROM w
),
bc AS (SELECT b, count(*) AS c FROM bg GROUP BY b)
SELECT doc_id, count(*) AS n_bigrams,
       round(sum(ln(uc.c + 0.5 * v.v) - ln(bc.c + 0.5)) / count(*), 6) AS avg_nll
FROM bg JOIN bc USING (b) JOIN uc ON bg.w1 = uc.t CROSS JOIN v
GROUP BY doc_id
"""


def d_pack(sf_dir: str):
    """Concat-and-chunk sequence packing layout (the GPT/Llama
    pre-training stream): concatenate documents in doc_id order, slice
    into 2048-unit sequences, report per document where it lands. A
    distributed ordered prefix-scan — per-bucket totals, driver-side
    exclusive scan over B ints, within-bucket cumsum; the oracle is the
    same rule as one SQL window cumsum."""
    from ..stages.packing import packed_layout

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return packed_layout(ds, id_col="doc_id", size_col="n_chars", chunk=2048)


D_PACK_SQL = """
WITH s AS (
  SELECT doc_id, n_chars,
         CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
  FROM documents
)
SELECT doc_id, tok_start,
       CAST(tok_start // 2048 AS BIGINT) AS seq_first,
       CAST((tok_start + greatest(n_chars - 1, 0)) // 2048 AS BIGINT) AS seq_last,
       CAST((tok_start + greatest(n_chars - 1, 0)) // 2048
            - tok_start // 2048 + 1 AS BIGINT) AS n_seqs
FROM s
"""


def d_quality_clf(sf_dir: str):
    """CCNet/fastText-style model-based quality filter: train the
    hashed-BoW logistic classifier on a deterministic labeled sample
    (docs whose source index is divisible by 4 act as the "high
    quality" class), broadcast the weights, score the corpus streaming.
    Model scoring is not SQL-expressible -> rows-only check; pytest
    covers separability and determinism."""
    from ..stages.qualityclf import score_quality, train_quality_classifier

    sample = (
        _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
        .sort("doc_id")
        .limit(400)
        .to_pandas()
    )
    labels = (sample["source"].str[3:].astype(int) % 4 == 0).to_numpy(np.float64)
    w = train_quality_classifier(sample["text"].fillna("").tolist(), labels)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = score_quality(ds, w, concurrency=4)
    return out.select_columns(["doc_id", "quality_prob"])


def d_tfidf(sf_dir: str):
    """Per-document TF·IDF mass with corpus-exact document frequencies
    (two-pass distributed weighting: posting lists co-located by word
    hash, df computed bucket-locally, per-doc partials combined)."""
    from ..stages.text import tfidf_sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_sum(ds)


D_TFIDF_SQL = """
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents
),
tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY doc_id, w),
df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, round(sum(tf * ln(n.n * 1.0 / df.df)), 6) AS tfidf_sum
FROM tf JOIN df USING (w) CROSS JOIN n GROUP BY doc_id
"""


def d_bm25(sf_dir: str):
    """Okapi BM25 top-20 retrieval of the corpus against a 4-term
    query. df is computed only for the query terms (one tiny partial
    aggregate — no posting shuffle), idf scalars broadcast in the
    scoring closure, per-block local top-k before the global sort."""
    from ..stages.text import bm25_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_topk(ds, ["hash", "join", "scan", "merge"], k=20)


D_BM25_SQL = """
WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
avgd AS (SELECT count(*) * 1.0 / n.n AS avgdl FROM w, n GROUP BY n.n),
q(w) AS (VALUES ('hash'), ('join'), ('scan'), ('merge')),
df AS (SELECT q.w AS w, CAST(count(DISTINCT w0.doc_id) AS DOUBLE) AS df
       FROM q LEFT JOIN w w0 ON w0.w = q.w GROUP BY q.w),
idf AS (SELECT w, ln(1 + (n.n - df + 0.5) / (df + 0.5)) AS idf FROM df, n),
len AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM w GROUP BY doc_id),
tf AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM w
       WHERE w IN (SELECT w FROM q) GROUP BY doc_id, w)
SELECT d.doc_id AS doc_id,
       round(coalesce(sum(idf.idf * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * len.dl / avgd.avgdl))), 0), 6) AS bm25
FROM documents d
JOIN len ON len.doc_id = d.doc_id
LEFT JOIN tf ON tf.doc_id = d.doc_id
LEFT JOIN idf ON idf.w = tf.w
CROSS JOIN avgd
GROUP BY d.doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


def d_ngram_repetition(sf_dir: str):
    """Gopher's word-3-gram repetition quality signals per doc
    (stages/text.py:ngram_repetition_stats): top-n-gram character
    fraction and duplicated-n-gram character coverage. Row-local — the
    whole operator is one streaming map, zero exchange; the small-vocab
    synthetic corpus produces organic duplicate trigrams so the dup
    branch is exercised without injection."""
    from ..stages.text import ngram_repetition_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(ngram_repetition_stats, batch_format="pyarrow")
    return out.select_columns(
        ["doc_id", "top_ngram_char_frac", "dup_ngram_char_frac"]
    )


D_NGRAM_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
tot AS (SELECT doc_id, sum(length(w)) AS total FROM w GROUP BY doc_id),
t AS (
  SELECT a.doc_id, a.i AS s, a.w || ' ' || b.w || ' ' || c.w AS tg
  FROM w a
  JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN w c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
dup AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id, tg) AS c FROM t) x
  WHERE c >= 2),
cov AS (SELECT DISTINCT doc_id, unnest([s, s + 1, s + 2]) AS i FROM dup),
dupc AS (
  SELECT w.doc_id, sum(length(w.w)) AS dchars
  FROM w JOIN cov ON w.doc_id = cov.doc_id AND w.i = cov.i
  GROUP BY w.doc_id),
cnt AS (SELECT doc_id, tg, count(*) AS c FROM t GROUP BY doc_id, tg),
top AS (
  SELECT doc_id, (length(tg) - 2) * c AS tchars
  FROM (SELECT doc_id, tg, c,
               row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, tg) AS rn
        FROM cnt) r WHERE rn = 1)
SELECT d.doc_id,
       floor(COALESCE(top.tchars, 0) * 1.0 / greatest(COALESCE(tot.total, 0), 1)
             * 1000000 + 0.5005) / 1000000 AS top_ngram_char_frac,
       floor(COALESCE(dupc.dchars, 0) * 1.0 / greatest(COALESCE(tot.total, 0), 1)
             * 1000000 + 0.5005) / 1000000 AS dup_ngram_char_frac
FROM documents d
LEFT JOIN tot USING (doc_id)
LEFT JOIN dupc USING (doc_id)
LEFT JOIN top USING (doc_id)
ORDER BY d.doc_id
"""


def t_percent_rank(sf_dir: str):
    """Per-user rank transforms of event value: SQL percent_rank
    ((min-rank - 1)/(n - 1)) and cume_dist (max-rank / n). One entity
    shuffle; C-level pandas rank kernels across all of a bucket's
    users at once. Both outputs are dyadic quotients -> biased
    half-up quantizer in both engines."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"], split=True)

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("user_id")["value"]
        rmin = grp.rank(method="min").to_numpy(np.float64)
        rmax = grp.rank(method="max").to_numpy(np.float64)
        n = grp.transform("size").to_numpy(np.float64)
        pr = (rmin - 1) / np.maximum(n - 1, 1)
        cd = rmax / n
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "percent_rank": np.floor(pr * 1e6 + 0.5005) / 1e6,
            "cume_dist": np.floor(cd * 1e6 + 0.5005) / 1e6,
        })

    out = grouped_map(ds, "user_id", ranks).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


T_PERCENT_RANK_SQL = """
SELECT event_id,
       floor(percent_rank() OVER (PARTITION BY user_id ORDER BY value)
             * 1000000 + 0.5005) / 1000000 AS percent_rank,
       floor(cume_dist() OVER (PARTITION BY user_id ORDER BY value)
             * 1000000 + 0.5005) / 1000000 AS cume_dist
FROM events
ORDER BY event_id
"""


def d_pii_scrub(sf_dir: str):
    """PII detection + redaction summary per source (C4/RefinedWeb
    scrub step). The synthetic corpus has no organic PII, so a
    deterministic slice (doc_id ending in '7') gets a known PII
    sentence appended BEFORE scrubbing — both engines inject the same
    text, so the regex counting/redaction path is genuinely exercised
    and SQL-verified (DuckDB regexp_* replays the same RE2 patterns)."""
    from ..stages.text import pii_scrub_summary

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = pd.Series(batch["doc_id"].to_pandas()).astype(str)
        txt = pd.Series(batch["text"].to_pandas()).fillna("")
        hit = ids.str.endswith("7")
        txt = txt.where(
            ~hit,
            txt + " contact user@mail.com or 555-0132 from host 10.0.0.7",
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(txt), "source": batch["source"]}
        )

    return pii_scrub_summary(ds.map_batches(inject, batch_format="pyarrow"))


D_PII_SCRUB_SQL = """
WITH d AS (
  SELECT source,
         CASE WHEN CAST(doc_id AS VARCHAR) LIKE '%7'
              THEN text || ' contact user@mail.com or 555-0132 from host 10.0.0.7'
              ELSE text END AS text
  FROM documents
),
m AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z0-9.]+@[A-Za-z0-9]+\\.[A-Za-z]+')) AS e,
         len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}')) AS p,
         len(regexp_extract_all(text, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS i,
         length(text) - length(
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9.]+@[A-Za-z0-9]+\\.[A-Za-z]+', '[EMAIL]', 'g'),
               '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '[IP]', 'g'),
             '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')
         ) AS removed
  FROM d
)
SELECT source,
       CAST(sum(e) AS BIGINT) AS email_hits,
       CAST(sum(p) AS BIGINT) AS phone_hits,
       CAST(sum(i) AS BIGINT) AS ip_hits,
       CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
       CAST(sum(removed) AS BIGINT) AS chars_removed
FROM m GROUP BY source ORDER BY source
"""


def d_norm_dedup(sf_dir: str):
    """CCNet-style normalization dedup: lowercase, strip punctuation,
    collapse whitespace, then exact-dedup on the normalized form
    (keep min doc_id per group, report group size). A deterministic
    slice (doc_id % 50 == 1) is rewritten to case/punct variants of 3
    templates so cross-doc normalized duplicates actually exist; the
    oracle replays the injection and the normalization in SQL."""
    from ..stages.bucketing import default_buckets
    from ..stages.dedup import _HASH_KEY

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    B = default_buckets(ds)

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        txt = pd.Series(batch["text"].to_pandas()).fillna("")
        variant = pd.Series(
            np.where(
                (ids // 50) % 2 == 0,
                "The QUICK, brown fox #" + pd.Series(ids % 3).astype(str),
                "  the quick brown fox!! #" + pd.Series(ids % 3).astype(str) + " ",
            )
        )
        txt = txt.where(pd.Series(ids % 50 != 1), variant)
        norm = (
            txt.str.lower()
            .str.replace(r"[^a-z0-9\s]", "", regex=True)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        h = pd.util.hash_array(norm.to_numpy(dtype=object), hash_key=_HASH_KEY)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm": pa.array(norm),
                "__b": pa.array((h % B).astype(np.int64)),
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("norm", sort=False).agg(
            doc_id=("doc_id", "min"), group_size=("doc_id", "size")
        )
        return agg.reset_index(drop=True)

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(resolve, batch_format="pandas")
    )
    return out.sort("doc_id")


D_NORM_DEDUP_SQL = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 1 THEN
           CASE WHEN (doc_id // 50) % 2 = 0
                THEN 'The QUICK, brown fox #' || CAST(doc_id % 3 AS VARCHAR)
                ELSE '  the quick brown fox!! #' || CAST(doc_id % 3 AS VARCHAR) || ' '
           END
         ELSE text END AS text
  FROM documents
),
n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                             '\\s+', ' ', 'g')) AS norm
  FROM d
)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS group_size
FROM n GROUP BY norm ORDER BY doc_id
"""


_FUZZY_CANON = [
    "gradient descent converges slowly",
    "attention is all you need",
    "scaling laws for neural models",
    "data quality beats quantity",
    "the quick brown fox jumps",
    "tokenization shapes model behavior",
    "deduplication improves perplexity",
    "curriculum ordering of corpora",
]


def d_fuzzy_join(sf_dir: str):
    """Broadcast fuzzy lookup (spell-correction / entity-resolution
    shape): a deterministic slice (doc_id % 40 == 3) is rewritten to a
    single-edit typo of one of 8 canonical titles (delete / insert /
    replace at a doc_id-derived position), then each row finds its
    min-edit-distance canonical via the vectorized batched Levenshtein
    DP (stages/text.py:fuzzy_match — candidates broadcast in the task
    closure, no shuffle, no pair explosion). The oracle replays the
    typo injection with substr arithmetic and DuckDB levenshtein()."""
    from ..stages.text import fuzzy_match

    # 120 possible variants, precomputed once: (base idx, edit mode,
    # position) fully determine the string — rows just gather
    variants = np.empty(8 * 3 * 5, dtype=object)
    for bi, base in enumerate(_FUZZY_CANON):
        for mode in range(3):
            for p in range(1, 6):
                if mode == 0:
                    v = base[: p - 1] + base[p:]
                elif mode == 1:
                    v = base[:p] + "x" + base[p:]
                else:
                    v = base[: p - 1] + "z" + base[p:]
                variants[bi * 15 + mode * 5 + (p - 1)] = v

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def make_queries(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        ids = ids[ids % 40 == 3]
        k = ids // 40
        idx = (k % 8) * 15 + (k % 3) * 5 + (k % 5)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "q": pa.array(variants[idx], type=pa.string()),
            }
        )

    qs = ds.map_batches(make_queries, batch_format="pyarrow")
    return fuzzy_match(qs, _FUZZY_CANON, col="q", id_col="doc_id").sort("doc_id")


_FUZZY_CANON_SQL = ", ".join(
    f"({i}, '{t}')" for i, t in enumerate(_FUZZY_CANON)
)

D_FUZZY_JOIN_SQL = f"""
WITH canon(idx, title) AS (VALUES {_FUZZY_CANON_SQL}),
s AS (
  SELECT doc_id, doc_id // 40 AS k FROM documents WHERE doc_id % 40 = 3
),
v AS (
  SELECT s.doc_id,
         CASE CAST(k % 3 AS INT)
           WHEN 0 THEN substr(c.title, 1, CAST(k % 5 AS INT))
                       || substr(c.title, CAST(k % 5 AS INT) + 2)
           WHEN 1 THEN substr(c.title, 1, CAST(k % 5 AS INT) + 1) || 'x'
                       || substr(c.title, CAST(k % 5 AS INT) + 2)
           ELSE substr(c.title, 1, CAST(k % 5 AS INT)) || 'z'
                       || substr(c.title, CAST(k % 5 AS INT) + 2)
         END AS q
  FROM s JOIN canon c ON c.idx = CAST(k % 8 AS INT)
),
d AS (
  SELECT doc_id, title, levenshtein(q, title) AS dist,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY levenshtein(q, title), title
         ) AS rn
  FROM v CROSS JOIN canon
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, title AS best_match,
       CAST(dist AS BIGINT) AS dist
FROM d WHERE rn = 1 ORDER BY doc_id
"""


def d_top_tokens_by_source(sf_dir: str):
    """Per-source top-3 most frequent tokens (grouped heavy hitters —
    the per-domain boilerplate/vocabulary profile). The exchange is the
    (source, token) distinct-cell table, never token occurrences
    (stages/text.py:grouped_top_tokens)."""
    from ..stages.text import grouped_top_tokens

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    out = grouped_top_tokens(ds, k=3)
    return out.sort(["source", "c", "token"], descending=[False, True, False])


D_TOP_TOKENS_BY_SOURCE_SQL = """
WITH t AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents
),
c AS (SELECT source, token, count(*) AS c FROM t GROUP BY source, token),
r AS (
  SELECT source, token, c,
         row_number() OVER (PARTITION BY source ORDER BY c DESC, token) AS rn
  FROM c
)
SELECT source, token, CAST(c AS BIGINT) AS c
FROM r WHERE rn <= 3 ORDER BY source, c DESC, token
"""


def q_zorder(sf_dir: str):
    """Z-order (Morton) clustering key over (price, quantity) — the
    OPTIMIZE ZORDER layout primitive: one global min/max pass fixes the
    quantization, the interleave is row-local bit arithmetic
    (stages/partition.py:zorder_key), and sorting by the key co-locates
    rows for range scans on either column. Returns the 20 smallest keys
    deterministically; the oracle replays quantization + interleave."""
    from ..stages.partition import zorder_key

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"],
    )
    keyed = zorder_key(ds, ["l_extendedprice", "l_quantity"], bits=8)
    return (
        keyed.select_columns(["l_orderkey", "l_linenumber", "z"])
        .sort(["z", "l_orderkey", "l_linenumber"])
        .limit(20)
    )


def _zorder_sql() -> str:
    qcols = []
    for i, c in enumerate(("l_extendedprice", "l_quantity")):
        qcols.append(
            f"least(greatest(CAST(floor(({c} - lo{i}) * 256.0 / span{i}) AS BIGINT), 0), 255) AS q{i}"
        )
    inter = " + ".join(
        f"((q{i} >> {j}) & 1) * {1 << (j * 2 + i)}"
        for i in range(2)
        for j in range(8)
    )
    return f"""
WITH b AS (
  SELECT min(l_extendedprice) AS lo0,
         CASE WHEN max(l_extendedprice) > min(l_extendedprice)
              THEN max(l_extendedprice) - min(l_extendedprice) ELSE 1 END AS span0,
         min(l_quantity) AS lo1,
         CASE WHEN max(l_quantity) > min(l_quantity)
              THEN max(l_quantity) - min(l_quantity) ELSE 1 END AS span1
  FROM lineitem
),
q AS (
  SELECT l_orderkey, l_linenumber, {", ".join(qcols)}
  FROM lineitem, b
)
SELECT l_orderkey, l_linenumber, CAST({inter} AS BIGINT) AS z
FROM q ORDER BY z, l_orderkey, l_linenumber LIMIT 20
"""


Q_ZORDER_SQL = _zorder_sql()


def t_window_distinct(sf_dir: str):
    """Distinct active users per tumbling 1-hour window (the streaming
    count-distinct: DAU/HAU shape). The window index is row-local; each
    batch pre-dedups its (window, user) pairs, so the exchange is the
    distinct-pair cell table, then a second window-keyed aggregate
    counts rows per window — events never shuffle and nothing touches
    the driver."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def add_win(batch: pa.Table) -> pa.Table:
        # NULL users don't count as a distinct user (SQL count(DISTINCT)
        # semantics) and would also drift the column dtype to float
        batch = batch.filter(pc.is_valid(batch["user_id"]))
        epoch = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        df = pd.DataFrame(
            {
                "win": epoch // 3_600_000_000,
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "win": pa.array(df["win"].to_numpy(np.int64)),
                "user_id": pa.array(df["user_id"].to_numpy()),
            }
        )

    pairs = ds.map_batches(add_win, batch_format="pyarrow")
    distinct_pairs = pairs.groupby(["win", "user_id"]).count()

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["win"])

    out = (
        distinct_pairs.map_batches(project, batch_format="pyarrow")
        .groupby("win")
        .count()
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["win", "n_users"])

    return out.map_batches(rename, batch_format="pyarrow").sort("win")


T_WINDOW_DISTINCT_SQL = """
SELECT epoch_us(ts) // 3600000000 AS win,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY win ORDER BY win
"""


def d_remove_dup_spans(sf_dir: str):
    """Duplicated-passage REMOVAL (Lee et al. substring dedup at
    word-5-gram resolution): every occurrence of a corpus-duplicated
    5-gram is cut except the global first; overlapping spans merge
    (stages/dedup.py:remove_dup_spans — two data-sized exchanges,
    occurrence rows then doc-co-located cut lists). The oracle replays
    keeper election (row_number over (doc, pos)), interval expansion
    and the whitespace-normalized rebuild in SQL."""
    from ..stages.dedup import remove_dup_spans

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return remove_dup_spans(ds, shingle_words=5).sort("doc_id")


D_REMOVE_DUP_SPANS_SQL = """
WITH w AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '\\S+') AS ws
  FROM documents
),
gi AS (
  SELECT doc_id, ws,
         unnest(range(1, greatest(len(ws) - 4, 0) + 1)) AS i
  FROM w
),
g AS (
  SELECT doc_id, i,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
               || ' ' || ws[i+4] AS sh
  FROM gi
),
c AS (SELECT sh, count(*) AS n FROM g GROUP BY sh),
k AS (
  SELECT g.sh, g.doc_id, g.i,
         row_number() OVER (PARTITION BY g.sh ORDER BY g.doc_id, g.i) AS rn
  FROM g JOIN c USING (sh) WHERE c.n >= 2
),
cov AS (
  SELECT DISTINCT doc_id, i + unnest(range(0, 5)) AS j
  FROM k WHERE rn > 1
),
t AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS i FROM w
),
kept AS (
  SELECT t.doc_id, t.i, t.word
  FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id AND t.i = cov.j
  WHERE cov.j IS NULL
),
kc AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text,
         count(*) AS nk
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id, COALESCE(kc.text, '') AS text,
       CAST(len(w.ws) - COALESCE(kc.nk, 0) AS BIGINT) AS n_removed
FROM w LEFT JOIN kc USING (doc_id)
ORDER BY w.doc_id
"""


_CURATION_SEED = 31
_CURATION_MULT = (2654435761 * (2 * _CURATION_SEED + 1)) % (1 << 32)
_CURATION_INV = pow(_CURATION_MULT, -1, 1 << 32)


def d_lm3_score(sf_dir: str):
    """Trigram LM quality scoring with stupid backoff (Brants et al.
    2007; the CCNet-grade upgrade over the bigram scorer): fit one
    streaming count pass, score in a second with the model broadcast
    once (stages/lm.py:fit_trigram_lm/score_trigram_lm). Fit corpus ==
    score corpus here, so every trigram hits its own count and the
    oracle replays S = c123/c12 exactly; the backoff chain is
    pytest-covered on held-out text."""
    from ..stages.lm import fit_trigram_lm, score_trigram_lm

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lm = fit_trigram_lm(ds)
    return score_trigram_lm(ds, lm).sort("doc_id")


D_LM3_SCORE_SQL = """
WITH w AS (
  SELECT doc_id,
         unnest(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS word,
         generate_subscripts(regexp_extract_all(COALESCE(text, ''), '\\S+'), 1) AS i
  FROM documents
),
t AS (
  SELECT a.doc_id, a.word AS w1, b.word AS w2, c.word AS w3
  FROM w a
  JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
tc AS (SELECT w1, w2, w3, count(*) AS c FROM t GROUP BY 1, 2, 3),
bt AS (
  SELECT a.word AS w1, b.word AS w2
  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
bc AS (SELECT w1, w2, count(*) AS c FROM bt GROUP BY 1, 2)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(avg(-ln(tc.c * 1.0 / bc.c)), 6) AS avg_nll
FROM t
JOIN tc USING (w1, w2, w3)
JOIN bc ON bc.w1 = t.w1 AND bc.w2 = t.w2
GROUP BY t.doc_id ORDER BY t.doc_id
"""


def q_audit(sf_dir: str):
    """Data-quality audit report in one pass per table: referential
    integrity (orders whose o_custkey has no customer — broadcast
    anti-probe, small side ships once), key uniqueness (duplicate
    p_partkey count via a partial-counts aggregate), and null/blank
    rates on documents.text. One row per check: (check, n_bad, n_total)
    — the pre-ingest validation gate a pipeline runs before training."""
    import ray
    from ray.data.aggregate import Sum

    checks = []

    # 1. FK: orders.o_custkey -> customer.c_custkey (broadcast anti-probe)
    cust = np.sort(
        _read(sf_dir, "customer", columns=["c_custkey"]).to_pandas()["c_custkey"].to_numpy()
    )
    cust_ref = ray.put(cust)
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def orphan_partial(batch: pa.Table) -> pa.Table:
        from ..stages.arrowutil import sorted_lookup

        keys = batch["o_custkey"].to_numpy()
        _, found = sorted_lookup(ray.get(cust_ref), keys)
        return pa.table(
            {"bad": pa.array([int((~found).sum())]), "tot": pa.array([len(keys)])}
        )

    r = (
        orders.map_batches(orphan_partial, batch_format="pyarrow")
        .aggregate(Sum("bad", alias_name="bad"), Sum("tot", alias_name="tot"))
    )
    checks.append(("fk_orders_customer", int(r["bad"]), int(r["tot"])))

    # 2. duplicate primary keys in part (distinct-cell aggregate)
    part = _read(sf_dir, "part", columns=["p_partkey"])

    def key_counts(batch: pa.Table) -> pa.Table:
        k, c = np.unique(batch["p_partkey"].to_numpy(), return_counts=True)
        return pa.table({"k": pa.array(k), "c": pa.array(c.astype(np.int64))})

    kc = (
        part.map_batches(key_counts, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("c", alias_name="c"))
    )

    def dup_partial(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy()
        return pa.table(
            {
                "bad": pa.array([int(c[c > 1].sum() - (c > 1).sum())]),
                "tot": pa.array([int(c.sum())]),
            }
        )

    r = kc.map_batches(dup_partial, batch_format="pyarrow").aggregate(
        Sum("bad", alias_name="bad"), Sum("tot", alias_name="tot")
    )
    checks.append(("dup_part_keys", int(r["bad"]), int(r["tot"])))

    # 3. null-or-blank text rate in documents
    docs = _read(sf_dir, "documents", columns=["text"])

    def blank_partial(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas())
        # ASCII-whitespace blank (space/tab/newline/CR) — the oracle
        # strips the same 4 characters; bare .strip() would also eat
        # unicode whitespace DuckDB's trim does not
        bad = int((s.isna() | (s.fillna("").str.strip(" \t\n\r") == "")).sum())
        return pa.table({"bad": pa.array([bad]), "tot": pa.array([len(s)])})

    r = docs.map_batches(blank_partial, batch_format="pyarrow").aggregate(
        Sum("bad", alias_name="bad"), Sum("tot", alias_name="tot")
    )
    checks.append(("blank_document_text", int(r["bad"]), int(r["tot"])))

    return pd.DataFrame(checks, columns=["check", "n_bad", "n_total"]).sort_values(
        "check"
    ).reset_index(drop=True)


Q_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'fk_orders_customer' AS check,
         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
         CAST(count(*) AS BIGINT) AS n_total
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  UNION ALL
  SELECT 'dup_part_keys',
         CAST(COALESCE(sum(c - 1), 0) AS BIGINT),
         CAST(sum(c) AS BIGINT)
  FROM (SELECT p_partkey, count(*) AS c FROM part GROUP BY p_partkey)
  UNION ALL
  SELECT 'blank_document_text',
         CAST(sum(CASE WHEN text IS NULL
                       OR trim(text, ' ' || chr(9) || chr(10) || chr(13)) = ''
                       THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM documents
) ORDER BY "check"
"""


def d_length_buckets(sf_dir: str):
    """Length-bucketed batching stats (the inference/serving padding
    plan): docs bucket by the power-of-two ceiling of their length;
    per bucket, the doc count and the padding waste a cap-sized batch
    would pay (bucket_cap − length summed). Row-local bucket index, one
    partially-combined hash aggregate — the mixing diagnostic before
    length-grouped batching."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def tag(batch: pa.Table) -> pa.Table:
        n = np.maximum(batch["n_chars"].to_numpy(zero_copy_only=False), 1)
        cap = np.int64(1) << np.ceil(np.log2(n)).astype(np.int64)
        return pa.table(
            {
                "bucket_cap": pa.array(cap),
                "pad": pa.array((cap - n).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket_cap")
        .aggregate(Count(alias_name="n_docs"), Sum("pad", alias_name="pad_waste"))
        .sort("bucket_cap")
    )


D_LENGTH_BUCKETS_SQL = """
WITH b AS (
  SELECT CAST(power(2, ceil(log2(greatest(n_chars, 1)))) AS BIGINT) AS bucket_cap,
         CAST(power(2, ceil(log2(greatest(n_chars, 1)))) AS BIGINT)
           - greatest(n_chars, 1) AS pad
  FROM documents
)
SELECT bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(pad) AS BIGINT) AS pad_waste
FROM b GROUP BY bucket_cap ORDER BY bucket_cap
"""


def d_curation_pipeline(sf_dir: str):
    """END-TO-END curation recipe in one call — the 'prepare a training
    epoch' composition: C4 rule filter → exact dedup (min-id keeper) →
    deterministic seeded shuffle → concat-and-chunk packed layout.
    Every stage is the library one (streaming; the only exchanges are
    the dedup bucket co-location and packed_layout's O(buckets) prefix
    scan). A deterministic slice (doc_id % 4 == 1) is rewritten to 7
    boilerplate templates long enough to SURVIVE the filter, so the
    dedup step genuinely removes rows. Packing is keyed by the shuffle
    key (a bijection of doc_id mod 2^32), inverted exactly afterwards;
    the oracle replays all four stages ending in the same window scan."""
    from ..stages.dedup import exact_dedup
    from ..stages.packing import packed_layout
    from ..stages.sampling import deterministic_shuffle_key

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pad = " ".join(["pad"] * 30)

    def inject_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        boiler = (
            "shared boilerplate passage number "
            + pd.Series(ids % 7).astype(str)
            + " "
            + pad
        )
        s = s.where(pd.Series(ids % 4 != 1), boiler)
        from ..stages.text import c4_keep_mask

        keep = c4_keep_mask(s)
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array(s, type=pa.string()),
                "n_chars2": pa.array(s.str.len().to_numpy(np.int64)),
            }
        )
        return out.filter(pa.array(keep))

    filtered = ds.map_batches(inject_filter, batch_format="pyarrow")
    deduped = exact_dedup(filtered, content_col="text", id_col="doc_id")
    keyed = deterministic_shuffle_key(
        deduped, key_col="doc_id", seed=_CURATION_SEED, out_col="skey"
    )
    layout = packed_layout(keyed, id_col="skey", size_col="n_chars2", chunk=2048)

    def unhash(batch: pa.Table) -> pa.Table:
        sk = batch["skey"].to_numpy().astype(np.uint64)
        did = ((sk - np.uint64(_CURATION_SEED)) * np.uint64(_CURATION_INV)) % np.uint64(
            1 << 32
        )
        return pa.table(
            {
                "doc_id": pa.array(did.astype(np.int64)),
                "tok_start": batch["tok_start"],
                "seq_first": batch["seq_first"],
                "seq_last": batch["seq_last"],
                "n_seqs": batch["n_seqs"],
            }
        )

    return layout.map_batches(unhash, batch_format="pyarrow").sort("doc_id")


D_CURATION_PIPELINE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 1
              THEN 'shared boilerplate passage number '
                   || CAST(doc_id % 7 AS VARCHAR) || ' ' || trim(repeat('pad ', 30))
              ELSE COALESCE(text, '') END AS text
  FROM documents
),
f AS (
  SELECT doc_id, text, length(text) AS n_chars2,
         len(regexp_extract_all(text, '\\S+')) AS n_words,
         length(regexp_replace(text, '\\s+', '', 'g')) AS nonws
  FROM d
),
kept AS (
  SELECT doc_id, text, n_chars2 FROM f
  WHERE n_words >= 30 AND n_words <= 10000
    AND nonws / greatest(n_words, 1) <= 4.6
    AND text NOT LIKE '%{{%'
    AND lower(text) NOT LIKE '%lorem ipsum%'
),
dd AS (
  SELECT doc_id, n_chars2,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM kept
),
s AS (
  SELECT doc_id, n_chars2,
         (doc_id * {_CURATION_MULT} + {_CURATION_SEED}) % 4294967296 AS skey
  FROM dd WHERE rn = 1
),
p AS (
  SELECT doc_id, n_chars2,
         CAST(COALESCE(SUM(n_chars2) OVER (ORDER BY skey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM s
)
SELECT doc_id, tok_start,
       CAST(tok_start // 2048 AS BIGINT) AS seq_first,
       CAST((tok_start + greatest(n_chars2 - 1, 0)) // 2048 AS BIGINT) AS seq_last,
       CAST((tok_start + greatest(n_chars2 - 1, 0)) // 2048
            - tok_start // 2048 + 1 AS BIGINT) AS n_seqs
FROM p ORDER BY doc_id
"""


def d_latest_version(sf_dir: str):
    """CDC / upsert compaction: collapse an append log to the LATEST
    record per key (max ts, tie-broken on event_id) — the
    Iceberg/Hudi-style snapshot materialization. Reuses the grouped
    top-n machinery: per-batch local top-1 combiner bounds the exchange
    at one row per (batch, key) before the key-hash shuffle."""
    from ..stages.sampling import grouped_topn

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = grouped_topn(
        ds, key_col="user_id", order_col="ts", n=1, descending=True,
        tiebreak_col="event_id",
    )
    return out.select_columns(["user_id", "event_id", "value"]).sort("user_id")


D_LATEST_VERSION_SQL = """
WITH r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id
         ) AS rn
  FROM events
)
SELECT user_id, event_id, value FROM r WHERE rn = 1 ORDER BY user_id
"""


def _split_shards(ds):
    """(historical, new) split of a doc table on doc_id % 10 >= 8 — the
    shared synthetic stand-in for yesterday's corpus vs today's shard,
    used by the incremental/drift queries and replayed by their
    oracles."""

    def shard(is_new: bool):
        def _f(batch: pa.Table) -> pa.Table:
            m = batch["doc_id"].to_numpy() % 10 >= 8
            return batch.filter(pa.array(m if is_new else ~m))

        return _f

    return (
        ds.map_batches(shard(False), batch_format="pyarrow"),
        ds.map_batches(shard(True), batch_format="pyarrow"),
    )


def d_minhash_incremental(sf_dir: str):
    """Incremental MinHash near-dedup: flag new-shard docs
    (doc_id % 10 >= 8) that are near-duplicates of the historical
    corpus (stages/dedup.py:minhash_dedup_incremental — band buckets
    co-locate both sides, only new×old pairs are scored, the
    historical side never broadcasts). Rows-only check (LSH family);
    pytest covers planted cross-shard near-dups."""
    from ..stages.dedup import minhash_dedup_incremental

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    old, new = _split_shards(ds)
    return minhash_dedup_incremental(new, old, threshold=0.5)


def d_psi(sf_dir: str):
    """Population Stability Index of the document-length distribution
    between the historical shard (doc_id % 10 < 8) and the new shard —
    the standard corpus-drift monitor. Reference min/max fixes the 10
    equal-width bins; each side streams one mergeable histogram pass
    (stages/stats.py:psi_drift). The oracle replays the binning and the
    (q-p)·ln(q/p) sum with the same 1e-6 zero-bin floor."""
    from ..stages.stats import psi_drift

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    ref, cur = _split_shards(ds)
    return psi_drift(ref, cur, col="n_chars", bins=10)


D_PSI_SQL = """
WITH ref AS (SELECT n_chars FROM documents WHERE doc_id % 10 < 8),
cur AS (SELECT n_chars FROM documents WHERE doc_id % 10 >= 8),
b AS (
  SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
         CASE WHEN max(n_chars) > min(n_chars)
              THEN CAST(max(n_chars) - min(n_chars) AS DOUBLE)
              ELSE 1.0 END AS span
  FROM ref
),
rb AS (
  SELECT least(greatest(CAST(floor((n_chars - lo) * 10.0 / span) AS INT), 0), 9) AS bin
  FROM ref, b
),
cb AS (
  SELECT least(greatest(CAST(floor((n_chars - lo) * 10.0 / span) AS INT), 0), 9) AS bin
  FROM cur, b
),
rc AS (SELECT bin, count(*) AS c FROM rb GROUP BY bin),
cc AS (SELECT bin, count(*) AS c FROM cb GROUP BY bin),
g AS (SELECT unnest(range(0, 10)) AS bin),
j AS (
  SELECT g.bin,
         greatest(COALESCE(rc.c, 0) * 1.0 / (SELECT count(*) FROM ref), 0.000001) AS p,
         greatest(COALESCE(cc.c, 0) * 1.0 / (SELECT count(*) FROM cur), 0.000001) AS q
  FROM g LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)
)
SELECT round(sum((q - p) * ln(q / p)), 6) AS psi,
       CAST((SELECT count(*) FROM ref) AS BIGINT) AS n_ref,
       CAST((SELECT count(*) FROM cur) AS BIGINT) AS n_cur
FROM j
"""


def d_embed_centroid(sf_dir: str):
    """Per-label embedding centroid (domain/class prototype vectors):
    mergeable (label, sum, count) partials stream out of one pass, the
    combine is group-count-sized (stages/embedding.py:grouped_centroid).
    Long-format output; the oracle zips unnest(embedding) with its
    1-based position and averages per (label, dim)."""
    from ..stages.embedding import grouped_centroid

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    return grouped_centroid(ds).sort(["label", "dim"])


D_EMBED_CENTROID_SQL = """
SELECT label, CAST(i AS BIGINT) AS dim, round(avg(v), 6) AS mean_v
FROM (
  SELECT label, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
)
GROUP BY label, i ORDER BY label, dim
"""


def d_embed_outliers(sf_dir: str):
    """Per-class embedding outliers: the 20 vectors farthest from their
    own label's centroid — the embedding-space mislabel/noise audit
    (stages/embedding.py:centroid_outliers — mergeable centroid fit,
    broadcast centroid matrix, per-block local top-k). The oracle
    recomputes centroids and L2 distances with zipped unnest."""
    from ..stages.embedding import centroid_outliers

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    return centroid_outliers(ds, k=20)


D_EMBED_OUTLIERS_SQL = """
WITH u AS (
  SELECT vec_id, label, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
),
m AS (SELECT label, i, avg(v) AS mu FROM u GROUP BY label, i),
d AS (
  SELECT u.vec_id, u.label,
         sqrt(sum((u.v - m.mu) * (u.v - m.mu))) AS dist
  FROM u JOIN m ON m.label = u.label AND m.i = u.i
  GROUP BY u.vec_id, u.label
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, label, round(dist, 6) AS dist
FROM d ORDER BY round(dist, 6) DESC, vec_id LIMIT 20
"""


def d_embed_dispersion(sf_dir: str):
    """Per-class embedding dispersion: mean squared L2 distance to the
    own-label centroid (intra-class variance — the compactness half of
    a cluster-quality audit, complementing d_embed_outliers). Same
    broadcast-centroid scan, but the output is one mergeable (label,
    sum, count) cell per batch — E[||x−μ||²] = E[||x||²] − ||μ||² is
    NOT used so the oracle replay stays a literal distance average."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.arrowutil import list_column_matrix
    from ..stages.embedding import grouped_centroid

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    cp = grouped_centroid(ds, round_to=12).to_pandas()
    labels = np.sort(cp["label"].unique())
    d = int(cp["dim"].max())
    C = np.zeros((len(labels), d), dtype=np.float64)
    for lab, g in cp.groupby("label"):
        C[np.searchsorted(labels, lab)] = g.sort_values("dim")["mean_v"].to_numpy()
    model = ray.put((labels, C))

    def partial(batch: pa.Table) -> pa.Table:
        labs, cent = ray.get(model)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "label": batch["label"],
                    "s": pa.array([], type=pa.float64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        X = list_column_matrix(batch["embedding"]).astype(np.float64)
        y = batch["label"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(labs, y)
        d2 = ((X - cent[pos]) ** 2).sum(axis=1)
        uniq, inv = np.unique(y, return_inverse=True)
        s = np.zeros(len(uniq))
        np.add.at(s, inv, d2)
        return pa.table(
            {
                "label": pa.array(uniq),
                "s": pa.array(s),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    agg["msd"] = np.round(agg["s"] / agg["n"], 6)
    agg["n"] = agg["n"].astype(np.int64)
    return agg[["label", "n", "msd"]].sort_values("label").reset_index(drop=True)


D_EMBED_DISPERSION_SQL = """
WITH u AS (
  SELECT vec_id, label, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
),
m AS (SELECT label, i, round(avg(v), 12) AS mu FROM u GROUP BY label, i),
d AS (
  SELECT u.vec_id, u.label, sum((u.v - m.mu) * (u.v - m.mu)) AS d2
  FROM u JOIN m ON m.label = u.label AND m.i = u.i
  GROUP BY u.vec_id, u.label
)
SELECT label, CAST(count(*) AS BIGINT) AS n, round(avg(d2), 6) AS msd
FROM d GROUP BY label ORDER BY label
"""


def d_contamination_matrix(sf_dir: str):
    """Cross-source n-gram contamination matrix (word-5-gram): distinct
    shared shingles + Jaccard per source pair — the 'are my sources
    secretly the same crawl' mixing diagnostic. Only (shingle-hash,
    source) distinct cells shuffle, bucket-co-located; the oracle
    rebuilds distinct 5-gram sets per source and self-joins in SQL."""
    from ..stages.dedup import source_contamination

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    return source_contamination(ds, shingle_words=5)


D_CONTAMINATION_MATRIX_SQL = """
WITH w AS (
  SELECT source, regexp_extract_all(text, '\\S+') AS ws FROM documents
),
g AS (
  SELECT DISTINCT source, sh FROM (
    SELECT source,
           unnest(list_transform(
             generate_series(1, greatest(len(ws) - 4, 0)),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                  || ws[i+3] || ' ' || ws[i+4]
           )) AS sh
    FROM w
  )
),
counts AS (SELECT source, count(*) AS d FROM g GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS shared
  FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, CAST(shared AS BIGINT) AS shared_ngrams,
       round(shared * 1.0 / (ca.d + cb.d - shared), 6) AS jaccard
FROM pairs
JOIN counts ca ON ca.source = source_a
JOIN counts cb ON cb.source = source_b
ORDER BY source_a, source_b
"""


def q_histogram(sf_dir: str):
    """Exact 10-bin equi-width histogram of lineitem prices — the
    profiling primitive behind range-partition planning and skew
    checks (stages/stats.py:histogram: one min/max aggregate, then one
    streaming bincount pass; empty bins reported too). The oracle
    replays the binning with the same floor arithmetic."""
    from ..stages.stats import histogram

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    return histogram(ds, col="l_extendedprice", bins=10)


Q_HISTOGRAM_SQL = """
WITH b AS (
  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
         CASE WHEN max(l_extendedprice) > min(l_extendedprice)
              THEN CAST(max(l_extendedprice) - min(l_extendedprice) AS DOUBLE)
              ELSE 1.0 END AS span
  FROM lineitem
),
x AS (
  SELECT least(greatest(
           CAST(floor((l_extendedprice - lo) * 10.0 / span) AS BIGINT), 0), 9) AS bin
  FROM lineitem, b
),
c AS (SELECT bin, count(*) AS n FROM x GROUP BY bin),
g AS (SELECT unnest(range(0, 10)) AS bin)
SELECT g.bin,
       round(lo + g.bin * span / 10.0, 6) AS bin_lo,
       round(lo + (g.bin + 1) * span / 10.0, 6) AS bin_hi,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM g LEFT JOIN c USING (bin), b
ORDER BY g.bin
"""


def d_group_split(sf_dir: str):
    """Leakage-safe grouped train/valid split (GroupKFold shape): every
    document of a SOURCE lands on the same side, decided by a
    deterministic hash of the group key — near-duplicate docs within a
    crawl can't straddle the split and leak. Row-local predicate, one
    partially-combined aggregate for the per-split report (docs,
    distinct sources, total chars). The oracle replays the hash on the
    numeric source suffix."""
    from ray.data.aggregate import Count, Sum

    from ..stages.sampling import det_hash_u32

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def tag(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_pandas())
        gid = src.str.slice(3).astype(np.int64).to_numpy()
        train = det_hash_u32(gid, 13) % np.uint64(10) < np.uint64(8)
        split = np.where(train, "train", "valid")
        return pa.table(
            {
                "split": pa.array(split, type=pa.string()),
                "source": batch["source"],
                "n_chars": batch["n_chars"],
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    # distinct sources per split is group-bounded: pre-dedup per batch
    def src_cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "split": batch["split"].to_pandas(),
                "source": batch["source"].to_pandas(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    per_split = tagged.groupby("split").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="n_chars")
    )
    srcs = (
        tagged.map_batches(src_cells, batch_format="pyarrow")
        .groupby(["split", "source"])
        .count()
        .groupby("split")
        .count()
    )
    a = per_split.to_pandas().set_index("split")
    b = srcs.to_pandas().set_index("split")["count()"]
    a["n_sources"] = b
    a = a.reset_index()[["split", "n_docs", "n_sources", "n_chars"]]
    a["n_sources"] = a["n_sources"].astype(np.int64)
    return a.sort_values("split").reset_index(drop=True)


_GSPLIT_MULT = (2654435761 * (2 * 13 + 1)) % (1 << 32)

D_GROUP_SPLIT_SQL = f"""
WITH s AS (
  SELECT source, n_chars,
         CASE WHEN (CAST(substr(source, 4) AS BIGINT) * {_GSPLIT_MULT} + 13)
                   % 4294967296 % 10 < 8
              THEN 'train' ELSE 'valid' END AS split
  FROM documents
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM s GROUP BY split ORDER BY split
"""


def d_weighted_sample(sf_dir: str):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res), weight = document length: the data-mixing draw that keeps k
    docs with probability proportional to size. Keys are row-local
    (deterministic id hash), so the corpus pays one streaming pass with
    a per-block top-k prefilter; the oracle replays u = (hash+0.5)/2^32
    and the ln(u)/w ordering in SQL."""
    from ..stages.sampling import weighted_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        w = pc.fill_null(pc.utf8_length(batch["text"]).cast(pa.int64()), 0)
        return pa.table({"doc_id": batch["doc_id"], "w": w})

    out = weighted_sample(
        ds.map_batches(prep, batch_format="pyarrow"), 100, weight_col="w"
    )
    return out.select_columns(["doc_id", "w"]).sort("doc_id")


# multiplier for det_hash_u32 seed=23, inlined: (2654435761 * 47) % 2^32
_ARES_MULT = (2654435761 * (2 * 23 + 1)) % (1 << 32)

D_WEIGHTED_SAMPLE_SQL = f"""
WITH s AS (
  SELECT doc_id, COALESCE(length(text), 0) AS w,
         (((doc_id * {_ARES_MULT} + 23) % 4294967296) + 0.5) / 4294967296.0 AS u
  FROM documents
),
k AS (
  SELECT doc_id, w FROM s WHERE w > 0
  ORDER BY ln(u) / w DESC LIMIT 100
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(w AS BIGINT) AS w
FROM k ORDER BY doc_id
"""


def d_incremental_dedup(sf_dir: str):
    """Incremental exact dedup of a new shard against the historical
    corpus (the daily-increment production shape): docs with
    doc_id % 10 >= 8 are 'new', the rest 'historical'; a deterministic
    slice (doc_id % 4 == 1) is rewritten to 7 shared boilerplate
    templates so cross-shard exact duplicates exist. dedup_against
    hash-partitions BOTH sides on the content hash into shared buckets
    and drops new rows whose content appears historically — neither
    side broadcasts or materializes (stages/dedup.py:dedup_against)."""
    from ..stages.dedup import dedup_against

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        txt = pd.Series(batch["text"].to_pandas()).fillna("")
        boiler = (
            "shared boilerplate passage number "
            + pd.Series(ids % 7).astype(str)
            + " repeated across shards"
        )
        txt = txt.where(pd.Series(ids % 4 != 1), boiler)
        return pa.table({"doc_id": batch["doc_id"], "text": pa.array(txt)})

    docs = ds.map_batches(inject, batch_format="pyarrow")

    old, new = _split_shards(docs)
    kept = dedup_against(new, old, content_col="text", id_col="doc_id")
    return kept.select_columns(["doc_id"]).sort("doc_id")


D_INCREMENTAL_DEDUP_SQL = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 1
              THEN 'shared boilerplate passage number '
                   || CAST(doc_id % 7 AS VARCHAR) || ' repeated across shards'
              ELSE COALESCE(text, '') END AS text
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM d
WHERE doc_id % 10 >= 8
  AND text NOT IN (SELECT text FROM d WHERE doc_id % 10 < 8)
ORDER BY doc_id
"""


def d_pca(sf_dir: str):
    """Streaming-covariance PCA over the embedding column: per-batch
    (n, sum, X'X) partials -> driver eigh -> broadcast projection.
    Eigenvectors are not SQL-expressible -> rows-only check; pytest
    compares against a full in-memory numpy PCA."""
    from ..stages.embedding import pca_fit, pca_transform

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    mean, comps, _ = pca_fit(ds, n_components=2)
    return pca_transform(ds, mean, comps).select_columns(["vec_id", "pc0", "pc1"])


def d_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over embeddings: seeded kmeans++ init
    on a deterministic sample, per-iteration broadcast centroids +
    per-cluster (sum, count) partials, final assignment pass. Iterative
    model fitting is not SQL-expressible -> rows-only; pytest verifies
    exact agreement with a driver-side numpy Lloyd run."""
    from ..stages.embedding import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centers = kmeans_fit(ds, n_clusters=8, n_iter=10, seed=42)
    return kmeans_assign(ds, centers)


def d_semdedup(sf_dir: str):
    """SemDeDup-shaped semantic near-dedup (Abbas et al. 2023): k-means
    the embedding space (streaming partials), then per-cluster greedy
    cosine dedup inside groupby(cluster).map_groups — O(cluster^2) work
    bounded by id-hash sub-sharding of mega-clusters. Iterative fit ->
    rows-only; pytest verifies planted near-dup pairs are flagged and
    every flag has a kept neighbor >= threshold."""
    import ray.data

    from ..stages.embedding import semdedup

    # plant scaled clones (same recipe as d_embedding_dedup) so the
    # result exercises the flag path, not just the keep path
    pdf = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).to_pandas()
    clones = pdf.head(10).copy()
    clones["vec_id"] = clones["vec_id"] + 10_000_000
    clones["embedding"] = clones["embedding"].map(lambda e: (np.asarray(e) * 1.0005).tolist())
    both = ray.data.from_pandas(pd.concat([pdf, clones], ignore_index=True)).repartition(8)
    out = semdedup(both, n_clusters=8, threshold=0.999, n_iter=10, seed=42)
    return out.sort("vec_id")


def d_knn(sf_dir: str):
    from ..stages.similarity import knn_bruteforce

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(q["embedding"].to_numpy())
    out = knn_bruteforce(ds, queries, k=5, query_ids=q["vec_id"].to_numpy())
    out = out.rename(columns={"id": "neighbor_id"})
    out["score"] = out["score"].round(6)
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "neighbor_id", "rank", "score"]]


D_KNN_SQL = """
SELECT query_id, neighbor_id, rank, score FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC, e.vec_id
           ) AS rank,
           round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS score
    FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3) q
    CROSS JOIN embeddings e
) WHERE rank <= 5
"""


def _perturbed_docs(sf_dir: str, n: int = 20, near: bool = True):
    import ray
    import ray.data

    # split=False: this read is immediately collected to pandas; the
    # repartition would just add a pass
    pdf = _read(sf_dir, "documents", columns=["doc_id", "text"], split=False).to_pandas()
    extra = pdf.head(n).copy()
    extra["doc_id"] = extra["doc_id"] + 10_000_000
    if near:
        extra["text"] = extra["text"] + " appended trailer words"
    ds = ray.data.from_pandas(pd.concat([pdf, extra], ignore_index=True))
    # from_pandas yields ONE block; split so signature hashing (the
    # dominant cost of the dedup pipelines) parallelizes across CPUs
    blocks = max(16, int(ray.cluster_resources().get("CPU", 4)))
    return ds.repartition(blocks)


def d_minhash_dedup(sf_dir: str):
    """Near-dup clusters over documents + 20 deterministic perturbed
    copies (so the output is non-trivial at every sf). No SQL oracle —
    LSH bucketing is not SQL-expressible; rows-only check. Published as
    a streaming Dataset via clusters_dataset — the path a consumer joins
    or sinks at scale; the pandas cluster map stays a test helper."""
    from ..stages.dedup import clusters_dataset, minhash_lsh_dedup

    out = minhash_lsh_dedup(_perturbed_docs(sf_dir), threshold=0.5)
    return clusters_dataset(out.sort_values("id").reset_index(drop=True))


def d_components(sf_dir: str):
    """Duplicate-cluster map via DISTRIBUTED connected components
    (stages/graph.py:connected_components — min-label propagation, two
    hash shuffles per pass, converged flag by aggregate): the 100TB
    path where the LSH pair graph itself outgrows driver-side
    union-find. Labels = component min doc id, deterministic. Pytest
    checks exact equality with the driver-side union-find clusters."""
    import ray.data

    from ..stages.dedup import minhash_lsh_dedup
    from ..stages.graph import connected_components

    docs = _perturbed_docs(sf_dir)
    pairs = minhash_lsh_dedup(docs, threshold=0.5, return_pairs=True)
    edges = ray.data.from_pandas(
        pd.DataFrame({"src": pairs["a"].astype(np.int64), "dst": pairs["b"].astype(np.int64)})
    )
    nodes = docs.map_batches(
        lambda t: pa.table({"id": t["doc_id"]}), batch_format="pyarrow"
    )
    out = connected_components(edges, nodes, max_iter=30)
    return out.to_pandas().sort_values("id").reset_index(drop=True)


def _pagerank_sql(n_iter: int = 8, d: float = 0.85) -> str:
    """DuckDB oracle for d_pagerank: the power iteration UNROLLED as a
    chain of plain GROUP-BY CTEs (aggregates inside a recursive term are
    not portable SQL). Each step applies exactly stages/graph.py:pagerank's
    update  r'(v) = (1-d)/N + d*D/N + d*Σ_{u→v} r(u)/outdeg(u)  with
    parallel edges kept (outdeg counts edge ROWS, as weigh() does).
    Both engines round to 9dp BEFORE the top-k sort so float last-bit
    association differences cannot reorder the result."""
    steps = []
    for k in range(1, n_iter + 1):
        p = f"r{k - 1}"
        steps.append(f"""r{k} AS MATERIALIZED (
  SELECT p.id, p.dangling,
         (1 - {d}) / (SELECT n FROM params)
         + {d} * (SELECT COALESCE(SUM(rank), 0) FROM {p} WHERE dangling)
             / (SELECT n FROM params)
         + {d} * COALESCE(c.contrib, 0) AS rank
  FROM {p} p LEFT JOIN (
    SELECT w.dst AS id, SUM(w.w * r.rank) AS contrib
    FROM w JOIN {p} r ON w.src = r.id GROUP BY w.dst) c USING (id))""")
    chain = ",\n".join(steps)
    return f"""
WITH e AS MATERIALIZED (
  SELECT CAST(l_suppkey AS BIGINT) AS src,
         CAST(l_partkey AS BIGINT) + 10000000 AS dst
  FROM lineitem WHERE (l_orderkey & 15) = 0),
w AS MATERIALIZED (
  SELECT src, dst, 1.0 / COUNT(*) OVER (PARTITION BY src) AS w FROM e),
nodes AS MATERIALIZED (
  SELECT id, bool_or(has_out) AS has_out FROM (
    SELECT src AS id, TRUE AS has_out FROM e
    UNION ALL SELECT dst AS id, FALSE AS has_out FROM e) GROUP BY id),
params AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS MATERIALIZED (SELECT id, NOT has_out AS dangling,
              1.0 / (SELECT n FROM params) AS rank FROM nodes),
{chain}
SELECT id, round(rank, 9) AS rank FROM r{n_iter}
ORDER BY round(rank, 9) DESC, id
LIMIT 25
"""


D_PAGERANK_SQL = _pagerank_sql(n_iter=8, d=0.85)


def q_components(sf_dir: str):
    """Distributed connected components over a SQL-EXPRESSIBLE edge set
    (the sparse supplier→part purchase graph; same Pregel-style
    min-label + pointer-jumping engine as d_components, whose LSH edge
    set can't be replayed in SQL). The oracle computes the exact
    fixpoint via a recursive transitive-closure CTE + min aggregate —
    so the iterative engine's convergence, not just one step, is
    value-verified."""
    import ray.data as _rd  # noqa: F401

    from ..stages.graph import connected_components

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_partkey"],
        where=pc.bit_wise_and(pc.field("l_orderkey"), 63) == 0,
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch["l_suppkey"].cast(pa.int64()),
            "dst": pc.add(batch["l_partkey"].cast(pa.int64()), pa.scalar(10_000_000)),
        })

    out = connected_components(
        li.map_batches(to_edges, batch_format="pyarrow"), max_iter=30
    )
    return out.to_pandas().sort_values("id").reset_index(drop=True)


Q_COMPONENTS_SQL = """
WITH RECURSIVE e AS (
  SELECT CAST(l_suppkey AS BIGINT) AS u,
         CAST(l_partkey AS BIGINT) + 10000000 AS v
  FROM lineitem WHERE (l_orderkey & 63) = 0),
ud AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
reach(a, b) AS (
  SELECT u AS a, u AS b FROM ud
  UNION
  SELECT r.a, ud.v AS b FROM reach r JOIN ud ON ud.u = r.b)
SELECT a AS id, min(b) AS component
FROM reach GROUP BY a ORDER BY id
"""


def d_pagerank(sf_dir: str):
    """Distributed checkpointed PageRank (stages/graph.py:pagerank)
    over the supplier→part purchase graph (a deterministic lineitem
    subset; part ids offset so the bipartite sides don't collide).
    SQL oracle unrolls the same 8 power-iteration steps as chained
    GROUP-BY CTEs (D_PAGERANK_SQL); both engines round to 9dp before
    the top-k sort, id tie-break. Pytest additionally verifies exact
    agreement with a dense numpy power iteration including
    dangling-mass redistribution."""
    from ..stages.graph import pagerank

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_partkey"],
        where=pc.bit_wise_and(pc.field("l_orderkey"), 15) == 0,
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch["l_suppkey"].cast(pa.int64()),
            "dst": pc.add(batch["l_partkey"].cast(pa.int64()), pa.scalar(10_000_000)),
        })

    edges = li.map_batches(to_edges, batch_format="pyarrow")
    out = pagerank(edges, n_iter=8)
    return (
        _round_cols(out, {"rank": 9})
        .sort(["rank", "id"], descending=[True, False])
        .limit(25)
    )


def d_simhash_dedup(sf_dir: str):
    from ..stages.dedup import clusters_dataset, simhash_dedup

    out = simhash_dedup(_perturbed_docs(sf_dir, near=False), max_hamming=3)
    return clusters_dataset(out.sort_values("id").reset_index(drop=True))


def d_embedding_dedup(sf_dir: str):
    import ray.data

    from ..stages.dedup import clusters_dataset, embedding_dedup

    pdf = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).to_pandas()
    dim = len(pdf["embedding"].iloc[0])
    clones = pdf.head(10).copy()
    clones["vec_id"] = clones["vec_id"] + 10_000_000
    clones["embedding"] = clones["embedding"].map(lambda e: (np.asarray(e) * 1.0005).tolist())
    both = ray.data.from_pandas(pd.concat([pdf, clones], ignore_index=True))
    out = embedding_dedup(both, threshold=0.999, dim=dim)
    return clusters_dataset(out.sort_values("id").reset_index(drop=True))


def d_interleave(sf_dir: str):
    """Deterministic source-interleave manifest (the dataloader layout
    step: round-robin across sources so a training stream never sees a
    long single-source run). Each doc's within-source ordinal comes
    from ONE entity shuffle (rank by doc_id inside the source's hash
    bucket); the interleaved position is then pure row-local arithmetic
    — ordered by (ordinal, source, doc_id) — and the first 200 rows of
    the manifest surface via the local-top-k combiner, so nothing
    corpus-sized sorts globally."""
    from ..stages.sampling import grouped_topn
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        g["rn"] = g.groupby("source", sort=False).cumcount()
        return g

    ranked = grouped_map(ds, "source", rank)

    # global first-200 of the (rn, source, doc_id) order. The local
    # top-k prefilter ranks by rn ALONE with n = 200 + a full rn level
    # of slack: an rn level holds at most one row per source, so every
    # row of every level the true top-200 touches survives the cut no
    # matter how the prefilter breaks ties; the exact (rn, source,
    # doc_id) sort then runs on that tiny superset.
    # slack must cover one full rn level = #distinct sources (20 in the
    # fixture; derived, not assumed, so the superset bound always holds)
    n_sources = int(
        ds.map_batches(
            lambda t: pa.table({"source": pc.unique(t["source"])}),
            batch_format="pyarrow",
        ).groupby("source").count().count()
    )
    top = grouped_topn(
        ranked.map_batches(
            lambda t: t.append_column("__g", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow",
        ),
        key_col="__g", order_col="rn", n=200 + n_sources, descending=False,
    ).to_pandas()
    top = top.sort_values(["rn", "source", "doc_id"], kind="stable").head(200)
    top["seq"] = np.arange(len(top), dtype=np.int64)
    return top[["seq", "doc_id", "source", "rn"]].reset_index(drop=True)


D_INTERLEAVE_SQL = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rn
  FROM documents),
o AS (
  SELECT doc_id, source, rn,
         row_number() OVER (ORDER BY rn, source, doc_id) - 1 AS seq
  FROM r)
SELECT seq, doc_id, source, rn FROM o WHERE seq < 200
ORDER BY seq
"""


def d_prefix_dedup(sf_dir: str):
    """Prefix-redundancy detection (truncated-crawl artifacts: a doc
    whose token sequence is a STRICT word-prefix of another doc is
    redundant). A prefix and its extension share their first word, so
    ONE first-word-hash exchange co-locates every candidate pair; per
    bucket a lexicographic sort makes each prefix ADJACENT to its
    extensions, so detection is a vectorized startswith over the
    running-maximum neighbor — O(n log n) per bucket, never O(n²).
    Injection: doc_id%11==4 docs get a half-length truncated clone
    (replayed with list slicing in the oracle). Returns flagged clone
    ids + the doc they extend into."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        txt = pd.Series(batch["text"].to_pandas()).fillna("")
        hit = np.flatnonzero((ids % 11 == 4))
        ex = txt.iloc[hit].str.findall(r"\S+")
        halves = ex.map(lambda ws: " ".join(ws[: len(ws) // 2]))
        keep = halves.str.len() > 0
        out = pd.DataFrame({
            "doc_id": np.concatenate([ids, ids[hit][keep] + 10_000_000]),
            "text": np.concatenate([txt.to_numpy(object), halves[keep].to_numpy(object)]),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    def first_word(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        fw = s.str.extract(r"^(\S+)", expand=False).fillna("")
        return batch.append_column("fw", pa.array(fw.to_numpy(object), type=pa.string()))

    def detect(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "extends_into": pd.Series([], dtype=np.int64)})
        if len(g) < 2:
            return empty
        t = g.sort_values(["text", "doc_id"], kind="stable")
        txt = t["text"].to_numpy(dtype="U")
        ids = t["doc_id"].to_numpy(np.int64)
        # lexicographic sort puts a strict prefix immediately before its
        # minimal extension (no corpus word contains a sub-space char),
        # so one shifted vectorized startswith finds every prefix; runs
        # of EQUAL texts inherit the run-final row's verdict (an exact
        # dup of a prefix is itself a prefix)
        raw = np.zeros(len(t), dtype=bool)
        raw[:-1] = np.char.startswith(txt[1:], np.char.add(txt[:-1], " "))
        into = np.full(len(t), -1, dtype=np.int64)
        into[:-1][raw[:-1]] = ids[1:][raw[:-1]]
        eq = np.zeros(len(t), dtype=bool)
        eq[1:] = txt[1:] == txt[:-1]
        run = np.cumsum(~eq) - 1
        df = pd.DataFrame({"run": run, "raw": raw, "into": into})
        by = df.groupby("run", sort=False)
        flags = by["raw"].transform("last").to_numpy(bool)
        into = by["into"].transform("last").to_numpy(np.int64)
        if not flags.any():
            return empty
        return pd.DataFrame({"doc_id": ids[flags], "extends_into": into[flags]})

    flagged = grouped_map(
        ds.map_batches(inject, batch_format="pyarrow")
          .map_batches(first_word, batch_format="pyarrow"),
        "fw", detect, batch_format="pandas",
    ).to_pandas()
    return flagged.sort_values("doc_id").reset_index(drop=True)


D_PREFIX_DEDUP_SQL = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string(ws[1 : len(ws) // 2], ' ') AS text
  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM documents)
  WHERE doc_id % 11 = 4 AND len(ws) // 2 >= 1),
pairs AS (
  SELECT a.doc_id, b.doc_id AS ext, b.text AS btext
  FROM d a JOIN d b ON starts_with(b.text, a.text || ' ')),
pick AS (
  SELECT doc_id, ext AS extends_into,
         row_number() OVER (PARTITION BY doc_id ORDER BY btext, ext) AS rn
  FROM pairs)
SELECT doc_id, extends_into FROM pick WHERE rn = 1
ORDER BY doc_id
"""


def d_dup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster SIZE HISTOGRAM (the dedup health report: how
    many clusters of each multiplicity exist). Deterministic injection
    makes real clusters (doc_id%7 texts duplicated, %21 triplicated —
    replayed as UNION ALL slices in the oracle). Content-hash cells
    ship instead of texts; two cell-sized aggregates (hash -> size,
    size -> n_clusters) and the exchange never carries a document
    body. Only sizes surface, so the engine-private pandas hash is
    fine here (unlike fingerprints, which must be replayable)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        txt = pd.Series(batch["text"].to_pandas()).fillna("")
        rep = np.where(ids % 21 == 0, 3, np.where(ids % 7 == 0, 2, 1))
        all_txt = txt.to_numpy(dtype=object).repeat(rep)
        h = pd.util.hash_array(all_txt)
        c = pd.DataFrame({"h": h}).groupby("h", as_index=False).size()
        return pa.Table.from_pandas(c.rename(columns={"size": "c"}),
                                    preserve_index=False)

    sizes = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("c", alias_name="size"))
    )
    hist = (
        sizes.map_batches(
            lambda t: pa.table({"size": t["size"]}), batch_format="pyarrow"
        )
        .groupby("size").aggregate(Count(alias_name="n_clusters"))
        .to_pandas()
    )
    return hist.sort_values("size").reset_index(drop=True)


D_DUP_CLUSTER_SIZES_SQL = """
WITH d AS (
  SELECT text FROM documents
  UNION ALL SELECT text FROM documents WHERE doc_id % 7 = 0
  UNION ALL SELECT text FROM documents WHERE doc_id % 21 = 0),
c AS (SELECT text, count(*) AS size FROM d GROUP BY text)
SELECT size, count(*) AS n_clusters FROM c GROUP BY size ORDER BY size
"""


def q_grouped_iqr(sf_dir: str):
    """Per-group p25/p75/IQR in ONE sketch pass (the multi-quantile
    ladder from stages/sketch.py:grouped_quantiles — grouped_quantile
    would re-execute the read per quantile). percentile_disc semantics,
    so the cutpoints are data values and the IQR subtraction is exact
    in both engines."""
    from ..stages.sketch import grouped_quantiles

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    out = grouped_quantiles(
        ds, key_cols=["l_returnflag"], value_col="l_extendedprice",
        qs=[0.25, 0.75], out_cols=["p25", "p75"],
    )
    out["iqr"] = out["p75"] - out["p25"]
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q_GROUPED_IQR_SQL = """
SELECT l_returnflag,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
       percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
       percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)
         - percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS iqr
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_skyline(sf_dir: str):
    """2-D skyline / Pareto-optimal set over parts: maximize retail
    price while minimizing size. The local frontier is a COMBINER
    (skyline of a union = skyline of unioned local skylines), so each
    block ships only its own frontier rows and the global merge sees a
    tiny union — the same shape FairExp's Pareto selection uses
    internally, exposed as a relational operator. Duplicate (price,
    size) pairs all survive (neither strictly dominates)."""
    from ..stages.partition import skyline_2d

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_size"])
    out = skyline_2d(ds, x_col="p_retailprice", y_col="p_size")
    return out.sort_values("p_partkey").reset_index(drop=True)


Q_SKYLINE_SQL = """
SELECT p_partkey, p_retailprice, p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice >= a.p_retailprice AND b.p_size <= a.p_size
    AND (b.p_retailprice > a.p_retailprice OR b.p_size < a.p_size))
ORDER BY p_partkey
"""


def q_grouped_mode(sf_dir: str):
    """Per-group mode with a deterministic tie rule (highest count,
    then smallest value): per-batch (key, value) count partials ship
    instead of rows — the exchange is bounded by distinct cells — and
    the winner pick is a lexsort over the tiny cell table."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pandas(),
            "l_quantity": batch["l_quantity"].to_numpy(zero_copy_only=False),
        })
        c = df.groupby(["l_returnflag", "l_quantity"], as_index=False).size()
        return pa.Table.from_pandas(c.rename(columns={"size": "c"}),
                                    preserve_index=False)

    counts = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_quantity"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    counts = counts.sort_values(
        ["l_returnflag", "c", "l_quantity"], ascending=[True, False, True],
        kind="stable",
    )
    out = counts.groupby("l_returnflag", as_index=False).head(1)
    out = out.rename(columns={"l_quantity": "mode_qty", "c": "n"})
    return out.sort_values("l_returnflag").reset_index(drop=True)


Q_GROUPED_MODE_SQL = """
SELECT l_returnflag, mode_qty, n FROM (
  SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY count(*) DESC, l_quantity) AS rn
  FROM lineitem GROUP BY l_returnflag, l_quantity) x
WHERE rn = 1
ORDER BY l_returnflag
"""


def q_salted_agg(sf_dir: str):
    """Skew-salted two-phase grouped aggregate over the Zipfian-ish
    order-priority key (explicit salting shuffle; one row per key)."""
    from ..stages.partition import salted_aggregate

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    out = salted_aggregate(
        ds, key="o_orderpriority", col="o_totalprice", agg="mean",
        salt=16, out_col="avg_price",
    )
    return _round_cols(out, {"avg_price": 4})


Q_SALTED_AGG_SQL = """
SELECT o_orderpriority, round(avg(o_totalprice), 4) AS avg_price
FROM orders GROUP BY o_orderpriority
"""


def t_row_number(sf_dir: str):
    """ROW_NUMBER() OVER (PARTITION BY user ORDER BY ts, event_id)."""
    from ..stages.temporal import row_number

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"], split=True)
    out = row_number(ds, key="user_id", ts="ts", tiebreak=["event_id"], out_col="rn")
    return out.select_columns(["event_id", "rn"])


T_ROW_NUMBER_SQL = """
SELECT event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
"""


def t_rolling(sf_dir: str):
    """Per-user rolling 3-row sum of purchase value ordered by (ts,
    event_id) — the windowed-aggregate operator (Arrow-native bucket
    scan, vectorized prefix sums)."""
    from ..stages.temporal import rolling_agg

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)
    out = rolling_agg(
        ds, key="user_id", ts="ts", col="value", window=3, agg="sum",
        out_col="roll_sum3", tiebreak=["event_id"],
    )
    return _round_cols(out.select_columns(["event_id", "roll_sum3"]), {"roll_sum3": 6})


T_ROLLING_SQL = """
SELECT event_id,
       round(sum(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS roll_sum3
FROM events
"""


def t_rolling_range(sf_dir: str):
    """Per-user trailing 6-hour TIME window sum (RANGE frame) — the
    time-range variant of the windowed aggregate; per-entity-segment
    binary-search frame start, exact ns arithmetic."""
    from ..stages.temporal import rolling_agg

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)
    out = rolling_agg(
        ds, key="user_id", ts="ts", col="value", window=0,
        range_seconds=6 * 3600.0, agg="sum", out_col="roll6h", tiebreak=["event_id"],
    )
    return _round_cols(out.select_columns(["event_id", "roll6h"]), {"roll6h": 6})


T_ROLLING_RANGE_SQL = """
SELECT event_id,
       round(sum(value) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW), 6) AS roll6h
FROM events
"""


def q_grouped_median(sf_dir: str):
    """Per-group exact-semantics median via the mergeable weighted-value
    sketch combiner (stages/sketch.py:grouped_median) — no row shuffle,
    only per-(batch, group) summaries leave the stream."""
    from ..stages.sketch import grouped_median

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    out = grouped_median(
        ds, key_cols=["l_returnflag"], value_col="l_quantity", out_col="med_qty"
    )
    out["med_qty"] = out["med_qty"].round(6)
    return out


Q_GROUPED_MEDIAN_SQL = """
SELECT l_returnflag, round(median(l_quantity), 6) AS med_qty
FROM lineitem
GROUP BY l_returnflag
"""


def q_grouped_p90(sf_dir: str):
    """Per-group discrete 90th percentile via the mergeable sketch
    (percentile_disc semantics: smallest value at cumulative rank
    >= 0.9 N)."""
    from ..stages.sketch import grouped_quantile

    # low-cardinality value column: exact at EVERY scale (the sketch
    # compresses only past sketch_k distinct values per batch-group;
    # high-cardinality columns get bounded rank error instead)
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    out = grouped_quantile(
        ds, key_cols=["l_returnflag"], value_col="l_quantity",
        q=0.9, out_col="p90_qty",
    )
    out["p90_qty"] = out["p90_qty"].round(6)
    return out


Q_GROUPED_P90_SQL = """
SELECT l_returnflag,
       round(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity), 6) AS p90_qty
FROM lineitem
GROUP BY l_returnflag
"""


def d_lang_id(sf_dir: str):
    """Stopword-overlap language ID (actor-pool stage; tables compiled
    once per actor in __init__)."""
    from ..stages.text import language_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(language_id, batch_format="pyarrow")
    return out.select_columns(["doc_id", "lang_pred"])


_LANG_SQL_SETS = {
    "en": "'the','and','of','to','a','in','is','that','it','for','was','with'",
    "de": "'der','die','das','und','ist','nicht','ein','mit','für','von','zu'",
    "fr": "'le','la','les','et','est','une','pour','que','dans','des','du'",
    "es": "'el','la','los','las','y','es','una','para','que','en','del','por'",
}

D_LANG_ID_SQL = f"""
WITH w AS (
  SELECT doc_id,
         regexp_matches(coalesce(text, ''), '[一-鿿]') AS cjk,
         regexp_extract_all(lower(coalesce(text, '')), '[a-zà-ÿ]+') AS words
  FROM documents
), c AS (
  SELECT doc_id, cjk,
         len(list_filter(words, x -> list_contains([{_LANG_SQL_SETS['en']}], x))) AS n_en,
         len(list_filter(words, x -> list_contains([{_LANG_SQL_SETS['de']}], x))) AS n_de,
         len(list_filter(words, x -> list_contains([{_LANG_SQL_SETS['fr']}], x))) AS n_fr,
         len(list_filter(words, x -> list_contains([{_LANG_SQL_SETS['es']}], x))) AS n_es
  FROM w
)
SELECT doc_id,
       CASE WHEN cjk THEN 'zh'
            WHEN n_en >= greatest(n_en, n_de, n_fr, n_es) THEN 'en'
            WHEN n_de >= greatest(n_de, n_fr, n_es) THEN 'de'
            WHEN n_fr >= greatest(n_fr, n_es) THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM c
"""


def d_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: detected language (same stopword
    classifier as d_lang_id) × labeled lang column, one O(langs²) cell
    exchange — the metadata-vs-content mismatch audit that catches
    mislabeled shards before they poison a per-language mixture."""
    from ray.data.aggregate import Sum

    from ..stages.text import language_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def cells(batch: pa.Table) -> pa.Table:
        scored = language_id(batch)
        df = pd.DataFrame({
            # fillna('') <-> SQL COALESCE: pandas groupby DROPS NULL keys,
            # which would silently lose exactly the mislabeled rows this
            # audit exists to count
            "lang": scored["lang"].to_pandas().fillna(""),
            "lang_pred": scored["lang_pred"].to_pandas(),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["lang", "lang_pred"], as_index=False).sum(),
            preserve_index=False,
        )

    out = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


D_LANG_CONFUSION_SQL = f"""
WITH w AS (
  SELECT doc_id, lang,
         regexp_matches(coalesce(text, ''), '[一-鿿]') AS cjk,
         regexp_extract_all(lower(coalesce(text, '')), '[a-zà-ÿ]+') AS words
  FROM documents
), c AS (
  SELECT doc_id, lang, cjk,
         len(list_filter(words, x -> list_contains([{_LANG_SQL_SETS['en']}], x))) AS n_en,
         len(list_filter(words, x -> list_contains([{_LANG_SQL_SETS['de']}], x))) AS n_de,
         len(list_filter(words, x -> list_contains([{_LANG_SQL_SETS['fr']}], x))) AS n_fr,
         len(list_filter(words, x -> list_contains([{_LANG_SQL_SETS['es']}], x))) AS n_es
  FROM w
), p AS (
  SELECT lang,
         CASE WHEN cjk THEN 'zh'
              WHEN n_en >= greatest(n_en, n_de, n_fr, n_es) THEN 'en'
              WHEN n_de >= greatest(n_de, n_fr, n_es) THEN 'de'
              WHEN n_fr >= greatest(n_fr, n_es) THEN 'fr'
              ELSE 'es' END AS lang_pred
  FROM c)
SELECT COALESCE(lang, '') AS lang, lang_pred, count(*) AS n
FROM p GROUP BY COALESCE(lang, ''), lang_pred
ORDER BY lang, lang_pred
"""


def d_jaccard(sf_dir: str):
    """Exact word-3-gram Jaccard for adjacent doc pairs (doc_id % 50 == 0
    paired with doc_id + 1): pair members co-located by a grouped_map
    on the pair key, similarity computed exactly per pair."""
    from ..stages.dedup import ngram_jaccard
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        mask = (ids % 50 == 0) | (ids % 50 == 1)
        t = batch.filter(pa.array(mask))
        pair = t["doc_id"].to_numpy() // 50
        return t.append_column("pair_id", pa.array(pair))

    def pair_jaccard(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("pair_id", sort=False):
            if len(grp) != 2:
                continue
            grp = grp.sort_values("doc_id")
            a, b = grp.iloc[0], grp.iloc[1]
            if b["doc_id"] != a["doc_id"] + 1:
                continue
            out.append(
                (a["doc_id"], b["doc_id"],
                 round(ngram_jaccard(a["text"] or "", b["text"] or ""), 6))
            )
        return pd.DataFrame(out, columns=["a_id", "b_id", "jaccard"])

    picked = ds.map_batches(pick, batch_format="pyarrow")
    return grouped_map(picked, "pair_id", pair_jaccard)


D_JACCARD_SQL = """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS w FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.w AS wa, b.w AS wb
  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 50 = 0
), g AS (
  SELECT a_id, b_id,
    list_distinct(list_transform(generate_series(1, greatest(len(wa) - 2, 0)),
        i -> wa[i] || ' ' || wa[i+1] || ' ' || wa[i+2])) AS ga,
    list_distinct(list_transform(generate_series(1, greatest(len(wb) - 2, 0)),
        i -> wb[i] || ' ' || wb[i+1] || ' ' || wb[i+2])) AS gb
  FROM pairs
)
SELECT a_id, b_id,
       round(CASE WHEN len(ga) = 0 AND len(gb) = 0 THEN 1.0
            ELSE len(list_intersect(ga, gb)) * 1.0
                 / greatest(len(list_distinct(ga || gb)), 1) END, 6) AS jaccard
FROM g
"""


def d_fingerprint(sf_dir: str):
    """Rolling polynomial-hash document fingerprints (order-sensitive;
    not SQL-expressible — rows-only check)."""
    from ..stages.text import fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(fingerprint, batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"])


def d_char_fingerprint(sf_dir: str):
    """Char-level Horner fingerprints (stages/text.py:char_fingerprint)
    — the SQL-verifiable fingerprint variant: the oracle replays the
    identical mod-2^61-1 arithmetic with a recursive HUGEINT power
    table and one grouped ordered sum, so the 122-bit limb reduction in
    the Ray kernel is value-checked bit-for-bit. (Assumes no newline
    codepoints, true of this corpus — SQL '.' skips them.)"""
    from ..stages.text import char_fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(char_fingerprint, batch_format="pyarrow")
    return out.select_columns(["doc_id", "char_fp"])


D_CHAR_FINGERPRINT_SQL = """
WITH RECURSIVE pw(k, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (v * 1000003) % 2305843009213693951 FROM pw
  WHERE k < (SELECT COALESCE(max(length(text)), 0) FROM documents)),
ch AS (
  SELECT doc_id, length(text) AS L,
         unnest(regexp_extract_all(text, '.')) AS c,
         generate_subscripts(regexp_extract_all(text, '.'), 1) AS i
  FROM documents),
fp AS (
  SELECT ch.doc_id,
         CAST(SUM(CAST(ord(ch.c) AS HUGEINT) * pw.v)
              % 2305843009213693951 AS BIGINT) AS char_fp
  FROM ch JOIN pw ON pw.k = ch.L - ch.i
  GROUP BY ch.doc_id)
SELECT d.doc_id, COALESCE(fp.char_fp, 0) AS char_fp
FROM documents d LEFT JOIN fp USING (doc_id)
ORDER BY d.doc_id
"""


def d_hash_features(sf_dir: str):
    """Hashing-trick bag-of-words (stages/text.py:hash_features):
    word -> horner_mod61(word) % 64 -> sparse per-doc (bucket, count)
    rows, no vocabulary pass. Row-local, zero exchange. The oracle
    re-derives every bucket with the same HUGEINT Horner arithmetic."""
    from ..stages.text import hash_features

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(hash_features, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "bucket"]).reset_index(drop=True)


D_HASH_FEATURES_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
pw(k, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (v * 1000003) % 2305843009213693951 FROM pw
  WHERE k < (SELECT COALESCE(max(length(w)), 0) FROM w)),
ch AS (
  SELECT doc_id, i, length(w) AS L,
         unnest(regexp_extract_all(w, '.')) AS c,
         generate_subscripts(regexp_extract_all(w, '.'), 1) AS j
  FROM w),
h AS (
  SELECT doc_id, i,
         CAST(SUM(CAST(ord(c) AS HUGEINT) * pw.v)
              % 2305843009213693951 AS BIGINT) AS hw
  FROM ch JOIN pw ON pw.k = L - j
  GROUP BY doc_id, i)
SELECT doc_id, hw % 64 AS bucket, count(*) AS n
FROM h GROUP BY doc_id, hw % 64
ORDER BY doc_id, bucket
"""


def d_minhash_sig(sf_dir: str):
    """MinHash signature table with fully REPLAYABLE randomness
    (stages/sketch.py:minhash_signatures_replayable): word-3-shingles
    hash through the Horner string hash, 16 affine permutations with
    public constants, long (doc_id, perm, sig) layout. The SQL oracle
    re-derives every signature slot, value-verifying the minhash core
    the LSH dedup family rests on (the dedup path keeps its tuned
    private hash — bucketing isn't SQL-expressible anyway)."""
    from ..stages.sketch import minhash_signatures_replayable

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = minhash_signatures_replayable(ds).to_pandas()
    return out.sort_values(["doc_id", "perm"]).reset_index(drop=True)


D_MINHASH_SIG_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
t AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS tg
  FROM w a
  JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN w c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
sh AS (SELECT DISTINCT tg FROM t),
pw(k, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (v * 1000003) % 2305843009213693951 FROM pw
  WHERE k < (SELECT COALESCE(max(length(tg)), 0) FROM sh)),
ch AS (
  SELECT tg, length(tg) AS L,
         unnest(regexp_extract_all(tg, '.')) AS cc,
         generate_subscripts(regexp_extract_all(tg, '.'), 1) AS j
  FROM sh),
h AS (
  SELECT tg, CAST(SUM(CAST(ord(cc) AS HUGEINT) * pw.v)
                  % 2305843009213693951 AS BIGINT) AS hw
  FROM ch JOIN pw ON pw.k = L - j GROUP BY tg),
perms AS (
  SELECT d,
         (998244353 * (d + 1)) % 2305843009213693951 AS a,
         (167772161 * d) % 2305843009213693951 AS b
  FROM (SELECT unnest(generate_series(0, 15)) AS d))
SELECT t.doc_id, perms.d AS perm,
       CAST(min((CAST(h.hw AS HUGEINT) * perms.a % 2305843009213693951
                 + perms.b) % 2305843009213693951) AS BIGINT) AS sig
FROM t JOIN h USING (tg) CROSS JOIN perms
GROUP BY t.doc_id, perms.d
ORDER BY t.doc_id, perm
"""


def d_embed_quantize(sf_dir: str):
    """int8 embedding-quantization audit: per-dim [min,max] cells →
    row-local quantize/dequantize → per-vector reconstruction MSE
    (stages/embedding.py:quantize_error). Every arithmetic step is the
    same IEEE double op in both engines; only the per-vector sum is
    order-sensitive, so the MSE ships through the biased quantizer."""
    from ..stages.embedding import quantize_error

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = quantize_error(ds).to_pandas()
    out["mse"] = np.floor(out["mse"] * 1e9 + 0.5005) / 1e9
    return out.sort_values("vec_id").reset_index(drop=True)


D_EMBED_QUANTIZE_SQL = """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings),
mm AS (SELECT d, min(x) AS lo, max(x) AS hi FROM e GROUP BY d),
q AS (
  SELECT vec_id, x, lo, hi,
         CASE WHEN hi = lo THEN 0
              ELSE least(greatest(floor((x - lo) / (hi - lo) * 255 + 0.5), 0), 255)
         END AS qv
  FROM e JOIN mm USING (d)),
r AS (
  SELECT vec_id, x,
         CASE WHEN hi = lo THEN lo ELSE lo + qv / 255.0 * (hi - lo) END AS deq
  FROM q)
SELECT vec_id,
       floor(SUM((x - deq) * (x - deq)) / count(*) * 1000000000 + 0.5005)
         / 1000000000 AS mse
FROM r GROUP BY vec_id ORDER BY vec_id
"""


def fe_woe(sf_dir: str):
    """Weight-of-evidence categorical encoding (credit-scoring
    classic): per order-priority, ln of the smoothed odds ratio of
    status='F'. One O(categories) cell exchange; the ln runs on
    identical smoothed ratios in both engines (1-ulp libm differences
    absorbed by the biased quantizer)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderpriority": batch["o_orderpriority"].to_pandas(),
            "pos": (batch["o_orderstatus"].to_pandas() == "F").astype(np.int64),
        })
        df["neg"] = 1 - df["pos"]
        return pa.Table.from_pandas(
            df.groupby("o_orderpriority", as_index=False)[["pos", "neg"]].sum(),
            preserve_index=False,
        )

    out = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("pos", alias_name="pos"), Sum("neg", alias_name="neg"))
        .to_pandas()
    )
    pt, nt = out["pos"].sum(), out["neg"].sum()
    woe = np.log(((out["pos"] + 0.5) / pt) / ((out["neg"] + 0.5) / nt))
    out["woe"] = np.floor(woe * 1e6 + 0.5005) / 1e6
    return out.sort_values("o_orderpriority").reset_index(drop=True)


FE_WOE_SQL = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS neg
  FROM orders GROUP BY o_orderpriority),
t AS (SELECT sum(pos) AS pt, sum(neg) AS nt FROM c)
SELECT o_orderpriority, pos, neg,
       floor(ln(((pos + 0.5) / (SELECT pt FROM t))
                / ((neg + 0.5) / (SELECT nt FROM t))) * 1000000 + 0.5005)
         / 1000000 AS woe
FROM c ORDER BY o_orderpriority
"""


def d_minhash_jaccard_est(sf_dir: str):
    """MinHash-ESTIMATED Jaccard for the same adjacent pairs d_jaccard
    measures exactly: est = fraction of agreeing signature slots over
    the 16 replayable permutations. Because the signatures themselves
    are replayable, even the ESTIMATE is value-verified — and reading
    it next to d_jaccard's exact value exhibits the estimator's error
    empirically. Signature build is row-local; both members of a pair
    CO-LOCATE by pair id (d_jaccard's own layout), so the compare is
    bucket-local — nothing corpus-scale visits the driver."""
    from ..stages.sketch import minhash_signatures_replayable
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    sig = minhash_signatures_replayable(ds)

    def pair_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = (ids % 50 == 0) | (ids % 50 == 1)
        t = batch.filter(pa.array(keep))
        return t.append_column("pair", pa.array(t["doc_id"].to_numpy() // 50))

    def compare(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["doc_id"] % 50 == 0][["pair", "perm", "sig"]]
        b = g[g["doc_id"] % 50 == 1][["pair", "perm", "sig"]]
        m = a.merge(b, on=["pair", "perm"], suffixes=("_a", "_b"))
        if not len(m):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "n_perm": pd.Series([], dtype=np.int64),
                                 "est_jaccard": pd.Series([], dtype=np.float64)})
        m = m.assign(eq=(m["sig_a"] == m["sig_b"]).astype(np.int64))
        agg = m.groupby("pair", as_index=False)["eq"].agg(["size", "sum"])
        return pd.DataFrame({
            "a": agg["pair"].to_numpy(np.int64) * 50,
            "b": agg["pair"].to_numpy(np.int64) * 50 + 1,
            "n_perm": agg["size"].to_numpy(np.int64),
            "est_jaccard": np.floor(
                agg["sum"].to_numpy(np.float64)
                / agg["size"].to_numpy(np.float64) * 1e6 + 0.5005) / 1e6,
        })

    out = grouped_map(
        sig.map_batches(pair_rows, batch_format="pyarrow"), "pair", compare
    ).to_pandas()
    # pairs whose b-side doc doesn't exist drop, as in the SQL inner join
    return out.sort_values("a").reset_index(drop=True)


D_MINHASH_JACCARD_EST_SQL = f"""
WITH sig AS ({D_MINHASH_SIG_SQL.replace("ORDER BY t.doc_id, perm", "")})
SELECT a.doc_id AS a, a.doc_id + 1 AS b,
       count(*) AS n_perm,
       floor(avg(CASE WHEN a.sig = b.sig THEN 1.0 ELSE 0.0 END)
             * 1000000 + 0.5005) / 1000000 AS est_jaccard
FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1 AND b.perm = a.perm
WHERE a.doc_id % 50 = 0
GROUP BY a.doc_id
ORDER BY a
"""


def d_cond_entropy(sf_dir: str):
    """Per-source conditional word entropy H(w₂|w₁) in bits — the
    sequence-predictability signal behind perplexity-style corpus
    audits: -Σ p(w₁,w₂) log₂ p(w₂|w₁) over word bigrams. Per-batch
    (source, w₁, w₂) count cells bound the exchange to distinct
    bigrams; the entropy reduction is a tiny driver-side groupby."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def cells(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        ex = s.str.findall(r"\S+").explode().dropna()
        if not len(ex):
            return pa.table({"source": pa.array([], type=pa.string()),
                             "w1": pa.array([], type=pa.string()),
                             "w2": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        rows = ex.index.to_numpy(np.int64)
        words = ex.to_numpy(object)
        same = rows[:-1] == rows[1:]
        # fillna('') <-> SQL COALESCE: NULL sources must keep their group
        src = pd.Series(batch["source"].to_pandas()).fillna("").to_numpy(object)
        df = pd.DataFrame({
            "source": src[rows[:-1][same]],
            "w1": words[:-1][same],
            "w2": words[1:][same],
        })
        c = df.groupby(["source", "w1", "w2"], as_index=False).size()
        return pa.Table.from_pandas(c.rename(columns={"size": "c"}),
                                    preserve_index=False)

    from ..stages.temporal import grouped_map

    bigrams = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
    )
    # per-source bigram totals are O(sources) — broadcastable
    tot = (
        bigrams.map_batches(
            lambda t: pa.table({"source": t["source"], "c": t["c"]}),
            batch_format="pyarrow",
        ).groupby("source").aggregate(Sum("c", alias_name="n")).to_pandas()
    )
    tot_map = dict(zip(tot["source"], tot["n"].astype(np.float64)))

    def term_partial(g: pd.DataFrame) -> pd.DataFrame:
        # all w2 of a (source, w1) context co-locate in one bucket, so
        # ctx sums are bucket-local; only per-source partial term sums
        # leave — the driver never sees the corpus-scale bigram table
        key = g["source"].astype(str) + "\x1f" + g["w1"].astype(str)
        ctx = g.groupby(key, sort=False)["c"].transform("sum").to_numpy(np.float64)
        c = g["c"].to_numpy(np.float64)
        n = g["source"].map(tot_map).to_numpy(np.float64)
        term = -(c / n) * np.log2(c / ctx)
        out = pd.DataFrame({"source": g["source"], "term": term})
        return out.groupby("source", as_index=False)["term"].sum()

    def add_key(batch: pa.Table) -> pa.Table:
        k = pd.Series(batch["source"].to_pandas()).astype(str) + "\x1f" + \
            pd.Series(batch["w1"].to_pandas()).astype(str)
        return batch.append_column("ctxkey", pa.array(k.to_numpy(object), type=pa.string()))

    parts = grouped_map(
        bigrams.map_batches(add_key, batch_format="pyarrow"), "ctxkey",
        lambda g: term_partial(g.drop(columns=["ctxkey"])),
    )
    out = (
        parts.groupby("source").aggregate(Sum("term", alias_name="cond_entropy"))
        .to_pandas()
    )
    out["cond_entropy"] = np.floor(out["cond_entropy"] * 1e6 + 0.5005) / 1e6
    return out.sort_values("source").reset_index(drop=True)


D_COND_ENTROPY_SQL = """
WITH w AS (
  SELECT doc_id, COALESCE(source, '') AS source,
         unnest(regexp_extract_all(text, '\\S+')) AS t,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
bg AS (
  SELECT a.source, a.t AS w1, b.t AS w2, count(*) AS c
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY a.source, a.t, b.t),
tot AS (SELECT source, sum(c) AS n FROM bg GROUP BY source),
ctx AS (SELECT source, w1, sum(c) AS nc FROM bg GROUP BY source, w1)
SELECT bg.source,
       floor(sum(-(bg.c * 1.0 / tot.n) * log2(bg.c * 1.0 / ctx.nc))
             * 1000000 + 0.5005) / 1000000 AS cond_entropy
FROM bg JOIN tot USING (source) JOIN ctx ON ctx.source = bg.source AND ctx.w1 = bg.w1
GROUP BY bg.source
ORDER BY bg.source
"""


def d_doc_entropy(sf_dir: str):
    """Per-document unigram Shannon entropy (bits) — the
    repetitiveness/diversity quality feature: H = -Σ p log2 p over the
    doc's word distribution. Row-local (one explode + one (row, word)
    groupby per batch); empty docs score 0."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ent(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        ex = s.str.findall(r"\S+").explode().dropna()
        n = len(s)
        h = np.zeros(n, dtype=np.float64)
        if len(ex):
            df = pd.DataFrame({"r": ex.index.to_numpy(np.int64), "w": ex.to_numpy()})
            c = df.groupby(["r", "w"], sort=False).size().reset_index(name="c")
            tot = c.groupby("r", sort=False)["c"].transform("sum").to_numpy(np.float64)
            p = c["c"].to_numpy(np.float64) / tot
            term = -p * np.log2(p)
            h_idx = np.bincount(c["r"].to_numpy(np.int64), weights=term, minlength=n)
            h = h_idx
        return pa.table({
            "doc_id": batch["doc_id"],
            "entropy": pa.array(np.floor(h * 1e6 + 0.5005) / 1e6),
        })

    out = ds.map_batches(ent, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


D_DOC_ENTROPY_SQL = """
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents),
c AS (SELECT doc_id, t, count(*) AS c FROM w GROUP BY doc_id, t),
p AS (
  SELECT doc_id, c * 1.0 / sum(c) OVER (PARTITION BY doc_id) AS p FROM c),
e AS (SELECT doc_id, sum(-p * log2(p)) AS h FROM p GROUP BY doc_id)
SELECT d.doc_id,
       floor(COALESCE(e.h, 0) * 1000000 + 0.5005) / 1000000 AS entropy
FROM documents d LEFT JOIN e USING (doc_id)
ORDER BY d.doc_id
"""


def d_winnow(sf_dir: str):
    """Winnowing fingerprints (Schleimer et al. 2003 — the MOSS
    plagiarism-detection selection rule): min shingle hash per sliding
    window of 4 shingles, deduplicated per doc; any ≥6-word match
    between docs is guaranteed to share a print. Replayable hashes, so
    the oracle re-derives every selected print; per-doc summary uses
    xor (order-insensitive, overflow-free) alongside count/min/max."""
    from ..stages.sketch import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = winnow_fingerprints(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


D_WINNOW_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
t AS (
  SELECT a.doc_id, a.i AS s, a.t || ' ' || b.t || ' ' || c.t AS tg
  FROM w a
  JOIN w b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN w c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
sh AS (SELECT DISTINCT tg FROM t),
pw(k, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (v * 1000003) % 2305843009213693951 FROM pw
  WHERE k < (SELECT COALESCE(max(length(tg)), 0) FROM sh)),
ch AS (
  SELECT tg, length(tg) AS L,
         unnest(regexp_extract_all(tg, '.')) AS cc,
         generate_subscripts(regexp_extract_all(tg, '.'), 1) AS j
  FROM sh),
h AS (
  SELECT tg, CAST(SUM(CAST(ord(cc) AS HUGEINT) * pw.v)
                  % 2305843009213693951 AS BIGINT) AS hw
  FROM ch JOIN pw ON pw.k = L - j GROUP BY tg),
seq AS (SELECT t.doc_id, t.s, h.hw FROM t JOIN h USING (tg)),
win AS (
  SELECT doc_id,
         min(hw) OVER (PARTITION BY doc_id ORDER BY s
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
         row_number() OVER (PARTITION BY doc_id ORDER BY s) AS rn
  FROM seq),
sel AS (SELECT DISTINCT doc_id, m FROM win WHERE rn >= 4)
SELECT doc_id, count(*) AS n_prints, min(m) AS min_fp, max(m) AS max_fp,
       bit_xor(m) AS xor_fp
FROM sel GROUP BY doc_id ORDER BY doc_id
"""


def d_simhash_sig(sf_dir: str):
    """Replayable SimHash signature table (32-bit, packed int64):
    stages/sketch.py:simhash_replayable — sibling of d_minhash_sig; the
    oracle re-derives every signature bit, value-verifying the simhash
    core under the Hamming-band dedup (d_simhash_dedup keeps its tuned
    private hash; banding isn't SQL-expressible)."""
    from ..stages.sketch import simhash_replayable

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = simhash_replayable(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


D_SIMHASH_SIG_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents),
dt AS (SELECT DISTINCT t FROM w),
pw(k, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (v * 1000003) % 2305843009213693951 FROM pw
  WHERE k < (SELECT COALESCE(max(length(t)), 0) FROM dt)),
ch AS (
  SELECT t, length(t) AS L,
         unnest(regexp_extract_all(t, '.')) AS cc,
         generate_subscripts(regexp_extract_all(t, '.'), 1) AS j
  FROM dt),
h AS (
  SELECT t, CAST(SUM(CAST(ord(cc) AS HUGEINT) * pw.v)
                 % 2305843009213693951 AS BIGINT) AS hw
  FROM ch JOIN pw ON pw.k = L - j GROUP BY t),
bits AS (SELECT unnest(generate_series(0, 31)) AS j),
v AS (
  SELECT w.doc_id, bits.j,
         SUM(CASE WHEN (h.hw >> bits.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM w JOIN h USING (t) CROSS JOIN bits
  GROUP BY w.doc_id, bits.j),
sig AS (
  SELECT doc_id,
         SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS simhash
  FROM v GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(sig.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sig USING (doc_id)
ORDER BY d.doc_id
"""


def d_knn_ivf(sf_dir: str):
    """IVF-bucketed approximate nearest neighbors (recall < 1 by design
    vs the exact d_knn; rows-only check)."""
    from ..stages.similarity import knn_ivf

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(q["embedding"].to_numpy())
    out = knn_ivf(ds, queries, k=5, n_clusters=8, nprobe=3)
    out = out.rename(columns={"id": "neighbor_id"})
    out["score"] = out["score"].round(6)
    return out[["query_id", "rank", "neighbor_id", "score"]]


def d_knn_pq(sf_dir: str):
    """Product-quantization + ADC approximate nearest neighbors: the
    memory-bound scale path where each vector is scanned as m uint8
    codes instead of 4·d float bytes (stages/similarity.py:knn_pq).
    Recall < 1 by design — rows-only check; pytest asserts a planted
    exact-duplicate vector is retrieved at rank 1."""
    from ..stages.similarity import knn_pq

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(q["embedding"].to_numpy())
    out = knn_pq(ds, queries, k=5, m=8, codes=16)
    out = out.rename(columns={"id": "neighbor_id"})
    out["score"] = out["score"].round(6)
    return out[["query_id", "rank", "neighbor_id", "score"]]


# ---------------------------------------------------------------------------
# FairExp fairness measures (grouped aggregate -> driver combine)


def _fair_docs(sf_dir: str):
    """documents + deterministic pred/label: pred = long doc, y = parity
    of n_chars (guarantees both classes in every context/group)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])

    def add(batch: pa.Table) -> pa.Table:
        n = batch["n_chars"].to_numpy()
        batch = batch.append_column("pred", pa.array((n > 300).astype(np.float64)))
        return batch.append_column("y", pa.array((n % 2 == 0).astype(np.int8)))

    return ds.map_batches(add, batch_format="pyarrow")


def f_rod(sf_dir: str):
    """Relative Odds Difference conditioned on language contexts,
    protected group source='web' (reference fmeasures/ROD.py:62-141)."""
    from .fairexp import rod_measure

    v = rod_measure(
        _fair_docs(sf_dir), ctx_cols=["lang"], sens_col="source",
        pred_col="pred", protected="web",
    )
    return pd.DataFrame({"rod": [round(v, 6)]})


F_ROD_SQL = """
WITH d AS (
  SELECT lang AS ctx, source AS s,
         CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END AS pred
  FROM documents
), g AS (
  SELECT ctx,
         sum(CASE WHEN s <> 'web' THEN pred END) AS sp0,
         sum(CASE WHEN s <> 'web' THEN 1 END) AS n0,
         sum(CASE WHEN s = 'web' THEN pred END) AS sp1,
         sum(CASE WHEN s = 'web' THEN 1 END) AS n1,
         count(*) AS n
  FROM d GROUP BY ctx
), o AS (
  SELECT CASE WHEN coalesce(n0, 0) > 0 THEN sp0 / n0 ELSE 0.5 END AS p10,
         CASE WHEN coalesce(n1, 0) > 0 THEN sp1 / n1 ELSE 0.5 END AS p11,
         n FROM g
), v AS (
  SELECT (p10 / nullif(1 - p10, 0)) * ((1 - p11) / nullif(p11, 0)) AS orv, n FROM o
)
SELECT round(-abs(coalesce(sum(orv * n), 0) / (SELECT sum(n) FROM g) - 1), 6) AS rod
FROM v WHERE orv IS NOT NULL AND isfinite(orv)
"""


def _gap_query(sf_dir: str, kind: str, out_name: str):
    from .fairexp import gap_measure

    v = gap_measure(
        _fair_docs(sf_dir), ctx_cols=["lang"], sens_col="source",
        pred_col="pred", y_col="y", kind=kind,
    )
    return pd.DataFrame({out_name: [round(v, 6)]})


def f_cdp(sf_dir: str):
    """Conditional demographic parity: context-weighted max-min gap of
    selection rate across source groups (reference fmeasures/CDP.py:30-70)."""
    return _gap_query(sf_dir, "cdp", "cdp")


def f_ctpb(sf_dir: str):
    """Conditional TPR balance (reference fmeasures/CTPB.py:31-73)."""
    return _gap_query(sf_dir, "ctpb", "ctpb")


def f_ctnb(sf_dir: str):
    """Conditional TNR balance (reference fmeasures/CTNB.py)."""
    return _gap_query(sf_dir, "ctnb", "ctnb")


_F_GAP_SQL_TMPL = """
WITH d AS (
  SELECT lang AS ctx, source AS s,
         CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END AS pred,
         CASE WHEN n_chars %% 2 = 0 THEN 1 ELSE 0 END AS y
  FROM documents
), g AS (
  SELECT ctx, s, count(*) AS n, avg(pred) AS sr,
         sum(CASE WHEN y = 1 THEN pred END) AS spp,
         sum(CASE WHEN y = 1 THEN 1 END) AS np,
         sum(CASE WHEN y = 0 THEN 1.0 - pred END) AS snn,
         sum(CASE WHEN y = 0 THEN 1 END) AS nn
  FROM d GROUP BY ctx, s
), r AS (
  SELECT ctx, n, %(rate)s AS rate FROM g
), c AS (
  SELECT ctx, max(rate) - min(rate) AS gap, sum(n) AS n,
         count(*) AS kgroups, count(rate) AS kfinite
  FROM r GROUP BY ctx
)
SELECT round(coalesce(sum(CASE WHEN kgroups >= 2 AND kfinite >= 2 THEN gap * n END), 0)
       / (SELECT count(*) FROM d), 6) AS %(out)s
FROM c
"""

F_CDP_SQL = _F_GAP_SQL_TMPL % {"rate": "sr", "out": "cdp"}
F_CTPB_SQL = _F_GAP_SQL_TMPL % {
    "rate": "CASE WHEN coalesce(np, 0) > 0 THEN spp / np END", "out": "ctpb"
}
F_CTNB_SQL = _F_GAP_SQL_TMPL % {
    "rate": "CASE WHEN coalesce(nn, 0) > 0 THEN snn / nn END", "out": "ctnb"
}


def f_lifecycle(sf_dir: str):
    """Full FairExp lifecycle (sample -> search -> dup/MI filter ->
    distributed backfill -> NaN/Inf drop -> SFFS): returns the selection
    summary + backfilled row count (deterministic; rows-only check)."""
    from .fairexp import fairexp_lifecycle

    n = {"sf0.001": 3000, "sf0.01": 20000, "sf0.1": 100000}.get(
        sf_dir.rstrip("/").split("/")[-1], 20000
    )
    res = fairexp_lifecycle(n, sample_rows=1200, c_max=2)
    rows = [("__rows__", float(res["dataset"].count()))]
    rows += [("__acc__", round(res["acc"], 6)), ("__fair__", round(res["fair"], 6))]
    rows += [(f"sel:{s}", 1.0) for s in res["selected"]]
    rows += [(f"mi_drop:{s}", 0.0) for s in res["dropped_mi"]]
    return pd.DataFrame(rows, columns=["name", "value"])


def f_lifecycle_causal(sf_dir: str):
    """FairExp lifecycle with the BUILT-IN d-separation causal filter
    (pure-Python IAMB Markov-blanket stand-in for the reference's
    R/bnlearn subprocess, causality/d_separation.py): candidates whose
    values are not d-separated from `source` are vetoed before the
    backfill. Deterministic; rows-only check."""
    from .causality import builtin_causal_filter
    from .fairexp import fairexp_lifecycle

    n = {"sf0.001": 3000, "sf0.01": 20000, "sf0.1": 100000}.get(
        sf_dir.rstrip("/").split("/")[-1], 20000
    )
    res = fairexp_lifecycle(
        n, sample_rows=1200, c_max=2, causal_filter=builtin_causal_filter()
    )
    rows = [("__rows__", float(res["dataset"].count()))]
    rows += [("__acc__", round(res["acc"], 6))]
    rows += [(f"sel:{s}", 1.0) for s in res["selected"]]
    rows += [(f"causal_drop:{s}", 0.0) for s in res["dropped_causal"]]
    return pd.DataFrame(rows, columns=["name", "value"])


def f_sffs(sf_dir: str):
    """SFFS repair (floating forward selection with parallel
    eliminations) over in-memory backfilled token features; deterministic
    result — rows-only check (iterative model fitting, not SQL)."""
    from .fairexp import sffs_repair
    from .flagship import search_sample

    cols, y = search_sample(1200)
    feats = {
        "log_n_tok": np.log(cols["n_tok"]),
        "tok_mean": cols["tok_mean"],
        "tok_std": cols["tok_std"],
        "recip_n_tok": 1.0 / cols["n_tok"],
        "tok_distinct_ratio": cols["tok_distinct_ratio"],
    }
    names = sorted(feats)
    X = np.column_stack([feats[n] for n in names])
    ctx = np.digitize(cols["n_tok"], [64.0, 128.0, 256.0])
    res = sffs_repair(
        X, names, y, sensitive=cols["source"], contexts=ctx,
        protected="web", use_ray=True,
    )
    rows = [(n, 1) for n in res["selected"]]
    rows += [("__acc__", round(res["acc"], 6)), ("__fair__", round(res["fair"], 6))]
    return pd.DataFrame(rows, columns=["name", "value"])


def m_decode(sf_dir: str):
    """Multimodal decode plumbing: synthetic binary media -> actor-pool
    image-decode (deterministic fake codec) + audio frame sampling;
    returns per-item feature/frame summaries (rows-only — binary
    payloads and stub codecs have no SQL analog)."""
    import ray.data

    from ..stages.multimodal import decode_pipeline, synthetic_media_table

    n = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}.get(
        sf_dir.rstrip("/").split("/")[-1], 256
    )
    ds = ray.data.from_arrow(synthetic_media_table(n)).repartition(8)
    out = decode_pipeline(ds, fake=True, concurrency=2, batch_size=32, resize_scale=0.5)

    def summarize(batch: pa.Table) -> pa.Table:
        feats = batch["features"].to_pylist()
        frames = batch["frames"].to_pylist()
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "payload_len": pa.array(
                    [len(b) for b in batch["payload"].to_pylist()], type=pa.int64()
                ),
                "feat_dim": pa.array([len(f) for f in feats], type=pa.int32()),
                "feat_sum": pa.array(
                    [round(float(np.sum(f)), 6) for f in feats], type=pa.float64()
                ),
                "n_frames": pa.array([len(fr) for fr in frames], type=pa.int32()),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def m_decode_wav(sf_dir: str):
    """REAL audio codec path: deterministic RIFF/PCM16 payloads decoded
    in-container (pure-numpy WAV codec) through the AudioDecode actor
    pool -> per-item duration / RMS / zero-crossing-rate / frame-RMS
    features. Model-free but codec-real; rows-only check + pytest
    goldens (sine RMS = amplitude/sqrt(2))."""
    import ray.data

    from ..stages.multimodal import AudioDecode, synthetic_wav_table

    n = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}.get(
        sf_dir.rstrip("/").split("/")[-1], 256
    )
    ds = ray.data.from_arrow(synthetic_wav_table(n)).repartition(8)
    out = ds.map_batches(
        AudioDecode,
        fn_constructor_kwargs={"n_frames": 8},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )
    return out.select_columns(["item_id", "duration_s", "rms", "zcr"])


def m_audio_spectral(sf_dir: str):
    """REAL DSP path: spectral centroid / rolloff / band energies via
    numpy's FFT (stages/multimodal.py:AudioSpectral) — the WAV corpus's
    frames stack into ONE batched rfft per actor call. Rows-only check;
    pytest golden pins a pure sine's centroid to its frequency."""
    import ray.data

    from ..stages.multimodal import AudioSpectral, synthetic_wav_table

    n = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}.get(
        sf_dir.rstrip("/").split("/")[-1], 256
    )
    ds = ray.data.from_arrow(synthetic_wav_table(n)).repartition(8)
    out = ds.map_batches(
        AudioSpectral,
        fn_constructor_kwargs={"frame": 512},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )
    return out.select_columns(["item_id", "centroid_hz", "rolloff_hz"])


def m_phash_dedup(sf_dir: str):
    """IMAGE near-dup detection via perceptual hash (DCT pHash) —
    SimHash's multimodal sibling (stages/dedup.py:phash_dedup). The
    corpus is the deterministic PPM set plus, for every 8th item, a
    near-copy that is noise-perturbed AND re-encoded as PNG — so a
    cluster match proves perceptual identity across both pixel noise
    and container format. Rows-only check; pytest asserts planted
    pairs cluster and unrelated images don't."""
    import ray.data

    from ..stages.dedup import phash_dedup
    from ..stages.multimodal import decode_image, encode_png, synthetic_ppm_table

    n = {"sf0.001": 48, "sf0.01": 96, "sf0.1": 384}.get(
        sf_dir.rstrip("/").split("/")[-1], 96
    )
    base = synthetic_ppm_table(n)
    rng = np.random.default_rng(7)
    ids, payloads = list(base["item_id"].to_pylist()), list(base["payload"].to_pylist())
    for i in range(0, n, 8):
        img = decode_image(payloads[i]).astype(np.int64)
        noisy = np.clip(img + rng.integers(-1, 2, img.shape), 0, 255).astype(np.uint8)
        ids.append(f"dup-of-{ids[i]}")
        payloads.append(encode_png(noisy))
    ds = ray.data.from_arrow(
        pa.table({"item_id": ids, "payload": pa.array(payloads, type=pa.binary())})
    ).repartition(8)
    out = phash_dedup(ds, payload_col="payload", id_col="item_id", max_hamming=6)
    return out.sort_values("id").reset_index(drop=True)


def m_decode_y4m(sf_dir: str):
    """REAL video path: deterministic Y4M (YUV4MPEG2) clips — a plain
    uncompressed container, pure-numpy decodable — through the
    actor-pool frame-sample stage (decode, every-4th-frame sample,
    per-frame luma means). Compressed codecs would slot into the same
    actor signature; the container/schema/actor plumbing is real."""
    import ray.data

    from ..stages.multimodal import VideoFrameSample, synthetic_y4m_table

    n = {"sf0.001": 32, "sf0.01": 128, "sf0.1": 512}.get(
        sf_dir.rstrip("/").split("/")[-1], 128
    )
    ds = ray.data.from_arrow(synthetic_y4m_table(n)).repartition(8)
    out = ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"stride": 4},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=2,
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def m_decode_mjpeg(sf_dir: str):
    """REAL compressed-video path: deterministic MJPEG-in-AVI clips
    (RIFF container walk + per-frame baseline-JPEG decode via the
    pure-numpy codec, stages/jpeg.py) through the same actor-pool
    frame-sample stage as the Y4M twin — the stage dispatches on the
    payload magic, strides BEFORE decoding so skipped frames never pay
    the huffman+IDCT cost. Rows-only check (DuckDB cannot parse AVI);
    the container+codec roundtrip is golden-tested in
    tests/test_multimodal_codecs.py."""
    import ray.data

    from ..stages.multimodal import VideoFrameSample, synthetic_mjpeg_table

    n = {"sf0.001": 32, "sf0.01": 128, "sf0.1": 512}.get(
        sf_dir.rstrip("/").split("/")[-1], 128
    )
    ds = ray.data.from_arrow(synthetic_mjpeg_table(n)).repartition(8)
    out = ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"stride": 4},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=2,
    )
    return out.to_pandas().sort_values("media_id").reset_index(drop=True)


def m_decode_ppm(sf_dir: str):
    """REAL codec path: deterministic P6 PPM payloads decoded in-
    container (pure-numpy PPM/BMP codecs) through the actor-pool
    resize(0.5, nearest) -> decode -> 16-bin luminance histogram
    stages; returns per-item resized dims + feature summaries."""
    import ray.data

    from ..stages.multimodal import ImageDecode, ImageResize, synthetic_ppm_table

    n = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}.get(
        sf_dir.rstrip("/").split("/")[-1], 256
    )
    ds = ray.data.from_arrow(synthetic_ppm_table(n)).repartition(8)
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"scale": 0.5, "fake": False},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    ).map_batches(
        ImageDecode,
        fn_constructor_args=(False,),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )

    def summarize(batch: pa.Table) -> pa.Table:
        import json as _json

        feats = batch["features"].to_pylist()
        metas = [_json.loads(m) for m in batch["meta"].to_pylist()]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "w": pa.array([m["w"] for m in metas], type=pa.int32()),
                "h": pa.array([m["h"] for m in metas], type=pa.int32()),
                "feat_dim": pa.array([len(f) for f in feats], type=pa.int32()),
                "feat_sum": pa.array(
                    [round(float(np.sum(f)), 6) for f in feats], type=pa.float64()
                ),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def m_decode_png(sf_dir: str):
    """REAL compressed-codec path: deterministic PNG payloads (stdlib
    zlib + numpy decoder, stages/multimodal.py:decode_png) through the
    same actor-pool resize -> decode -> luminance-histogram stages as
    the PPM twin. Resize transcodes PNG -> PPM and updates media_type;
    decode dispatches on payload magic."""
    import ray.data

    from ..stages.multimodal import ImageDecode, ImageResize, synthetic_png_table

    n = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}.get(
        sf_dir.rstrip("/").split("/")[-1], 256
    )
    ds = ray.data.from_arrow(synthetic_png_table(n)).repartition(8)
    # fractional CPUs: two chained 2-actor pools at num_cpus=1 would pin
    # every core of a 4-CPU session and starve the upstream repartition
    # tasks (observed deadlock); 0.5 leaves task slots free
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"scale": 0.5, "fake": False},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=0.5,
    ).map_batches(
        ImageDecode,
        fn_constructor_args=(False,),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=0.5,
    )

    def summarize(batch: pa.Table) -> pa.Table:
        import json as _json

        feats = batch["features"].to_pylist()
        metas = [_json.loads(m) for m in batch["meta"].to_pylist()]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "w": pa.array([m["w"] for m in metas], type=pa.int32()),
                "h": pa.array([m["h"] for m in metas], type=pa.int32()),
                "feat_dim": pa.array([len(f) for f in feats], type=pa.int32()),
                "feat_sum": pa.array(
                    [round(float(np.sum(f)), 6) for f in feats], type=pa.float64()
                ),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def m_decode_jpeg(sf_dir: str):
    """REAL baseline-JPEG path: deterministic JPEG payloads (pure-numpy
    huffman+IDCT codec, stages/jpeg.py — the last formerly-stubbed
    codec tier) through the same actor-pool resize -> decode ->
    luminance-histogram stages as the PNG twin; payloads alternate
    4:4:4 and 4:2:0 so the MCU interleave and chroma-upsample decode
    paths both run. Resize transcodes JPEG -> PPM; decode dispatches on
    payload magic. Rows-only check (DuckDB cannot decode JPEG); the
    codec itself is golden-tested in tests/test_multimodal_codecs.py
    against independent naive-DCT math."""
    import ray.data

    from ..stages.multimodal import (
        ImageDecode,
        ImageResize,
        synthetic_jpeg_table,
    )

    n = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}.get(
        sf_dir.rstrip("/").split("/")[-1], 256
    )
    ds = ray.data.from_arrow(synthetic_jpeg_table(n)).repartition(8)
    # fractional CPUs: two chained 2-actor pools at num_cpus=1 would pin
    # every core of a 4-CPU session and starve the upstream repartition
    # tasks (observed deadlock); 0.5 leaves task slots free
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"scale": 0.5, "fake": False},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=0.5,
    ).map_batches(
        ImageDecode,
        fn_constructor_args=(False,),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
        num_cpus=0.5,
    )

    def summarize(batch: pa.Table) -> pa.Table:
        import json as _json

        feats = batch["features"].to_pylist()
        metas = [_json.loads(m) for m in batch["meta"].to_pylist()]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "w": pa.array([m["w"] for m in metas], type=pa.int32()),
                "h": pa.array([m["h"] for m in metas], type=pa.int32()),
                "subsample": pa.array([m["subsample"] for m in metas]),
                "feat_dim": pa.array([len(f) for f in feats], type=pa.int32()),
                "feat_sum": pa.array(
                    [round(float(np.sum(f)), 6) for f in feats],
                    type=pa.float64(),
                ),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-table pipelines (generated input; rows-only checks)


def tok_search(sf_dir: str):
    """Complexity-driven search on the seeded synthetic token table;
    returns the scored-candidate table (deterministic)."""
    from .flagship import search_sample
    from .search import ComplexityDrivenSearch
    from ..functions.expr import raw as raw_f

    cols, y = search_sample(1500)
    base = [
        raw_f("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512}),
        raw_f("tok_mean", properties={"min": float(cols["tok_mean"].min()), "max": float(cols["tok_mean"].max()), "has_zero": False, "distinct": None}),
        raw_f("source", "categorical", {"distinct": 5, "values": ["books", "chat", "code", "web", "wiki"]}),
    ]
    res = ComplexityDrivenSearch(c_max=2, epsilon=-1e9, use_ray=True, lr_max_iter=15).run(cols, y, base)
    rows = sorted(
        (s.name, s.complexity, round(s.score, 6)) for s in res.all_scored.values()
    )
    return pd.DataFrame(rows, columns=["name", "complexity", "score"])


def tok_search_explorekit(sf_dir: str):
    """Search with the ExploreKit op preset (reference feature_space/
    explorekit_transformations.py:19-41: equal-width discretize +
    minmax; add/mul/div/sub binaries) AND ExploreKit's own one-shot
    Fui/Foi/Foui enumeration order (candidate_generation/explorekit/
    Generator.py:27-94) instead of the layered complexity loop."""
    from .flagship import search_sample
    from .search import ComplexityDrivenSearch, EXPLOREKIT_OPS
    from ..functions.expr import raw as raw_f

    cols, y = search_sample(1500)
    base = [
        raw_f("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512}),
        raw_f("tok_mean", properties={"min": float(cols["tok_mean"].min()), "max": float(cols["tok_mean"].max()), "has_zero": False, "distinct": None}),
        raw_f("source", "categorical", {"distinct": 5, "values": ["books", "chat", "code", "web", "wiki"]}),
    ]
    res = ComplexityDrivenSearch(
        c_max=2, epsilon=-1e9, use_ray=True, lr_max_iter=15,
        strategy="explorekit", **EXPLOREKIT_OPS
    ).run(cols, y, base)
    rows = sorted(
        (s.name, s.complexity, round(s.score, 6)) for s in res.all_scored.values()
    )
    return pd.DataFrame(rows, columns=["name", "complexity", "score"])


def tok_search_tree(sf_dir: str):
    """Search with TreeGenerator's depth-layered expansion (reference
    candidate_generation/TreeGenerator.py:62-143): each round applies
    every transformation of its hard-coded op set — discretize(10),
    minmax, nansum/nanprod, divide/subtract, GroupByThen
    {max,min,mean,std} — to ALL features accumulated so far. Two rounds
    with a score-ranked frontier cap keep the query bounded; the
    strategy itself supports the reference's unbounded depth-3 run."""
    from .flagship import search_sample
    from .search import TREE_OPS, ComplexityDrivenSearch

    from ..functions.expr import raw as raw_f

    cols, y = search_sample(1000)
    base = [
        raw_f("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512}),
        raw_f("tok_mean", properties={"min": float(cols["tok_mean"].min()), "max": float(cols["tok_mean"].max()), "has_zero": False, "distinct": None}),
        raw_f("source", "categorical", {"distinct": 5, "values": ["books", "chat", "code", "web", "wiki"]}),
    ]
    res = ComplexityDrivenSearch(
        c_max=2, epsilon=-1e9, use_ray=True, lr_max_iter=15,
        strategy="tree", tree_depth=2, tree_frontier_cap=8, **TREE_OPS,
    ).run(cols, y, base)
    rows = sorted(
        (s.name, s.complexity, round(s.score, 6)) for s in res.all_scored.values()
    )
    return pd.DataFrame(rows, columns=["name", "complexity", "score"])


def tok_nested_cv(sf_dir: str):
    """Nested-CV re-score of the Pareto candidates (reference
    evaluation/nested_cv_scikit.py): outer folds held out, inner folds
    pick C, refit + test per outer fold; deterministic (seeded)."""
    from .flagship import search_sample
    from .search import ComplexityDrivenSearch, nested_cv_rescore
    from ..functions.expr import raw as raw_f

    cols, y = search_sample(1200)
    base = [
        raw_f("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512}),
        raw_f("tok_mean", properties={"min": float(cols["tok_mean"].min()), "max": float(cols["tok_mean"].max()), "has_zero": False, "distinct": None}),
    ]
    res = ComplexityDrivenSearch(c_max=2, epsilon=-1e9, use_ray=True, lr_max_iter=15).run(cols, y, base)
    feats = [s.feature for s in res.pareto]
    got = nested_cv_rescore(feats, cols, y, cv=4, c_grid=(0.1, 1.0, 10.0), max_iter=15)
    rows = sorted(
        (n, round(m, 6), round(s, 6)) for n, (m, s) in got.items()
    )
    return pd.DataFrame(rows, columns=["name", "nested_mean", "nested_std"])


def tok_side_metrics(sf_dir: str):
    """Per-candidate side metrics (reference run_evaluation.py:85-138 +
    196-204): RSS-based AIC/AICc/BIC on both k definitions and label
    consistency, for the Pareto candidates."""
    from .flagship import search_sample
    from .search import ComplexityDrivenSearch, compute_side_metrics
    from ..functions.expr import raw as raw_f

    cols, y = search_sample(1200)
    base = [
        raw_f("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512}),
        raw_f("tok_mean", properties={"min": float(cols["tok_mean"].min()), "max": float(cols["tok_mean"].max()), "has_zero": False, "distinct": None}),
    ]
    res = ComplexityDrivenSearch(c_max=2, epsilon=-1e9, use_ray=True, lr_max_iter=15).run(cols, y, base)
    scored = compute_side_metrics(res.pareto, cols, y, cv=4, max_iter=15)
    rows = sorted(
        (
            s.name,
            round(s.side["rss"], 6),
            round(s.side["aicc_k1"], 6),
            round(s.side["bic_kc"], 6),
            round(s.side["consistency"], 6),
        )
        for s in scored
    )
    return pd.DataFrame(rows, columns=["name", "rss", "aicc_k1", "bic_kc", "consistency"])


def f_nsga2(sf_dir: str):
    """NSGA-II evolutionary multi-objective feature selection
    (reference new_project/evolutionary.py:39-239): maximize (cv-f1,
    ROD fairness, -n_features) over binary masks; deterministic
    (seeded), rows-only check."""
    from .fairexp import nsga2_search
    from .flagship import search_sample

    cols, y = search_sample(1000)
    feats = {
        "log_n_tok": np.log(cols["n_tok"]),
        "tok_mean": cols["tok_mean"],
        "tok_std": cols["tok_std"],
        "recip_n_tok": 1.0 / cols["n_tok"],
        "tok_distinct_ratio": cols["tok_distinct_ratio"],
    }
    names = sorted(feats)
    X = np.column_stack([feats[n] for n in names])
    ctx = np.digitize(cols["n_tok"], [64.0, 128.0, 256.0])
    res = nsga2_search(
        X, names, y, sensitive=cols["source"], contexts=ctx, protected="web",
        cv=4, generations=8, max_iter=15, use_ray=True,
    )
    rows = [
        (";".join(r["selected"]), round(r["acc"], 6), round(r["fair"], 6), r["n_features"])
        for r in res["front"]
    ]
    return pd.DataFrame(rows, columns=["selected", "acc", "fair", "n_features"])


def f_select(sf_dir: str):
    """Feature-selection wrapper analogs (reference transformations/
    feature_selection/: RFE, SelectKBest(MI), Boruta, ReliefF) over the
    seeded token-table feature sample; returns each selector's kept
    set (deterministic, rows-only check — the selectors are iterative
    model fits, not SQL-expressible)."""
    from .flagship import search_sample
    from .selection import boruta_select, relieff_select, rfe_select, select_k_best_mi

    cols, y = search_sample(1000)
    feats = {
        "log_n_tok": np.log(cols["n_tok"]),
        "tok_mean": cols["tok_mean"],
        "tok_std": cols["tok_std"],
        "recip_n_tok": 1.0 / cols["n_tok"],
        "tok_distinct_ratio": cols["tok_distinct_ratio"],
    }
    names = sorted(feats)
    X = np.column_stack([feats[n] for n in names])
    rows = [
        ("rfe", ";".join(rfe_select(X, names, y, n_select=3))),
        ("select_k_mi", ";".join(select_k_best_mi(X, names, y, k=3))),
        ("boruta_accepted", ";".join(boruta_select(X, names, y, n_trials=12)["accepted"])),
        ("relieff", ";".join(relieff_select(X, names, y, k=3, sample=400))),
    ]
    return pd.DataFrame(rows, columns=["selector", "kept"])


def d_dedup_apply(sf_dir: str):
    """Streaming consumption of a near-dup cluster map: minhash clusters
    -> broadcast dup-id set -> map_batches anti-join over the full
    documents table (apply_dedup); returns surviving doc ids."""
    from ..stages.dedup import apply_dedup, minhash_lsh_dedup

    ds = _perturbed_docs(sf_dir)
    clusters = minhash_lsh_dedup(ds, threshold=0.5)
    return apply_dedup(ds, clusters).select_columns(["doc_id"])


def d_dedup_apply_exact(sf_dir: str):
    """The SAME streaming anti-join apply path as d_dedup_apply, fed an
    EXACT-dup cluster map instead of the LSH one — which makes the
    whole consume path SQL-verifiable (d_dedup_apply stays rows-only
    because LSH bucketing isn't SQL-expressible). Injection: doc_id%9==2
    docs get a verbatim clone at doc_id+10M; survivors are the min
    doc_id of each text group."""
    from ..stages.dedup import apply_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        txt = batch["text"].to_pandas().to_numpy(object)
        hit = np.flatnonzero(ids % 9 == 2)
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, ids[hit] + 10_000_000])),
            "text": pa.array(np.concatenate([txt, txt[hit]]), type=pa.string()),
        })

    both = ds.map_batches(inject, batch_format="pyarrow")

    # exact cluster map: content-hash cells co-locate by hash; each
    # bucket emits ONLY its non-min ids, so what reaches the driver is
    # the dup-id set apply_dedup broadcasts anyway — never the corpus
    def cells(batch: pa.Table) -> pa.Table:
        txt = pd.Series(batch["text"].to_pandas()).fillna("")
        return pa.table({
            "h": pa.array(pd.util.hash_array(txt.to_numpy(object)).astype(np.int64)),
            "id": batch["doc_id"],
        })

    from ..stages.temporal import grouped_map

    def dups(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("h")["id"].transform("min")
        return g.loc[g["id"] != m, ["id"]]

    dup_ids = grouped_map(
        both.map_batches(cells, batch_format="pyarrow"), "h", dups
    ).to_pandas()["id"]
    clusters = pd.DataFrame({"id": dup_ids, "is_dup": True})
    out = apply_dedup(both, clusters).select_columns(["doc_id"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


D_DEDUP_APPLY_EXACT_SQL = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 9 = 2)
SELECT doc_id FROM d
-- COALESCE matches the engine's fillna('') — a NULL text clusters with
-- the empty string, not in its own NULL partition
QUALIFY row_number() OVER (PARTITION BY COALESCE(text, '') ORDER BY doc_id) = 1
ORDER BY doc_id
"""


def d_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag documents sharing any 6-gram
    with a deterministic "benchmark" slice (the first 20 docs by id).
    The engine probes broadcast shingle HASHES; the oracle compares the
    raw 6-gram STRINGS in SQL — equal outcomes absent 64-bit hash
    collisions, so the oracle also guards the hash path."""
    from ..stages.dedup import decontaminate

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    bench = (
        _read(sf_dir, "documents", columns=["doc_id", "text"], split=False)
        .to_pandas()
        .sort_values("doc_id")
        .head(20)["text"]
        .tolist()
    )
    flagged = decontaminate(ds, bench, ngram_words=6, mode="flag")

    def summarize(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "source", "contaminated"])

    return flagged.map_batches(summarize, batch_format="pyarrow")


D_DECONTAMINATE_SQL = """
WITH w AS (
  SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS ws FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 5, 0)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                     ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5])) AS gram
  FROM w
),
bench AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
bg AS (SELECT DISTINCT gram FROM g JOIN bench USING (doc_id)),
hit AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram))
SELECT w.doc_id AS doc_id, w.source AS source,
       (hit.doc_id IS NOT NULL) AS contaminated
FROM w LEFT JOIN hit ON hit.doc_id = w.doc_id
"""


def tok_resumable(sf_dir: str):
    """Resumable checkpointed backfill: write the token table to
    /tmp, run the sharded backfill, then rerun — the second pass must
    skip every shard via its lineage record. Returns the deterministic
    (phase, computed, skipped) report (rows-only check)."""
    import shutil
    import tempfile

    from ..functions.expr import raw as raw_f, unary as unary_f
    from ..sources.token_table import write_token_table
    from ..state.checkpoint import resumable_backfill
    import glob as _glob

    base = tempfile.mkdtemp(prefix="tok_resumable_")
    try:
        in_dir = f"{base}/in"
        out_dir = f"{base}/out"
        write_token_table(in_dir, 4000, num_files=8)
        files = sorted(_glob.glob(f"{in_dir}/*.parquet"))
        n_tok = raw_f(
            "n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512}
        )
        feats = [unary_f("log", n_tok)]
        r1 = resumable_backfill(files, out_dir, feats, {}, num_shards=4)
        r2 = resumable_backfill(files, out_dir, feats, {}, num_shards=4)
        rows = [
            ("run1_computed", len(r1["computed"])),
            ("run1_skipped", len(r1["skipped"])),
            ("run2_computed", len(r2["computed"])),
            ("run2_skipped", len(r2["skipped"])),
        ]
        return pd.DataFrame(rows, columns=["phase", "n"])
    finally:
        shutil.rmtree(base, ignore_errors=True)


# Driver-side parquet twins of the seeded inputs the flagship consumes
# (scalar token columns + the as-of event stream), so DuckDB can oracle
# the WHOLE pipeline — distributed fit (minmax), backfill (log, gbt
# mean), leak-free as-of attach, and sessionization. The generator is a
# pure function of (seed, row index), so this twin is byte-identical to
# what token_table_dataset streams through the engine.
TOK_ORACLE_DIR = "/tmp/cdfc_tok_oracle"
_TOK_ORACLE_NS = (3000, 30000, 300000)  # sf0.001 / sf0.01 / sf0.1


def ensure_tok_oracle_fixtures(seed: int = 42, ns: tuple = _TOK_ORACLE_NS) -> str:
    """Idempotently write the oracle twins; returns the fixture dir."""
    import os

    import pyarrow.parquet as pq

    from ..sources.token_table import token_table_arrow
    from .flagship import source_feature_events

    os.makedirs(TOK_ORACLE_DIR, exist_ok=True)
    ev_path = f"{TOK_ORACLE_DIR}/events_seed{seed}.parquet"
    if not os.path.exists(ev_path):
        pq.write_table(
            pa.Table.from_pandas(source_feature_events(seed), preserve_index=False),
            ev_path,
        )
    for n in ns:
        p = f"{TOK_ORACLE_DIR}/tokens_{n}_seed{seed}.parquet"
        if not os.path.exists(p):
            pq.write_table(token_table_arrow(n, seed=seed).drop_columns(["tokens"]), p)
        if n <= 30000:
            # tokens-included twin for the oracles that unnest the list
            # column (tok_bigram_counts); kept to the gate sizes only
            pf = f"{TOK_ORACLE_DIR}/tokens_full_{n}_seed{seed}.parquet"
            if not os.path.exists(pf):
                pq.write_table(token_table_arrow(n, seed=seed), pf)
    return TOK_ORACLE_DIR


def tok_backfill(sf_dir: str):
    """Flagship backfill + temporal attach over the generated token table;
    returns a per-source summary covering every stage: count/sum (read),
    log (backfill kernel), minmax (distributed fit), gbt mean (grouped
    fit), as-of src_quality (PIT join) and session_idx (sessionize)."""
    from .flagship import run_flagship
    from ..functions.expr import raw as raw_f, unary as unary_f, groupbythen as gbt_f

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    # only this sf's twin (the oracle path writes all sizes via
    # __ray_entry__.oracle_sql); keeps bench reps from paying a 300k-row
    # driver-side generation they never read
    ensure_tok_oracle_fixtures(ns=(n,))
    n_tok = raw_f("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512})
    src = raw_f("source", "categorical", {"distinct": 5})
    selected = [
        unary_f("log", n_tok),
        unary_f("minmax", n_tok),
        gbt_f("mean", n_tok, src),
    ]
    out, _, _ = run_flagship(n, selected=selected, with_temporal=True)
    from ray.data.aggregate import Count, Mean, Sum

    summary = out.groupby("source").aggregate(
        Count(alias_name="n_rows"),
        Sum("n_tok", alias_name="sum_n_tok"),
        Mean("log(n_tok)", alias_name="avg_log_n_tok"),
        Mean("minmax(n_tok)", alias_name="avg_minmax_n_tok"),
        Mean("mean(n_tok by source)", alias_name="avg_gbt_n_tok"),
        Mean("asof_src_quality", alias_name="avg_src_quality"),
        Mean("session_idx", alias_name="avg_session_idx"),
    )
    def cast_sum(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("sum_n_tok")
        return batch.set_column(i, "sum_n_tok", pc.cast(batch["sum_n_tok"], pa.int64()))

    summary = summary.map_batches(cast_sum, batch_format="pyarrow")
    return _round_cols(
        summary,
        {
            "avg_log_n_tok": 6,
            "avg_minmax_n_tok": 6,
            "avg_gbt_n_tok": 6,
            "avg_src_quality": 6,
            "avg_session_idx": 6,
        },
    )


# Oracle for the flagship: the driver's correctness gate runs at
# sf=0.01 (30,000 rows); the SQL reads the seeded parquet twin written
# by ensure_tok_oracle_fixtures() and re-derives every stage — global
# minmax fit, ln backfill, per-source gbt mean, DuckDB-native ASOF JOIN
# for the PIT attach (engine: latest event_ts <= ingest_ts, exact
# allowed), and gap-sessionization via lag + running sum with the same
# strict ">1800s" break compared at microsecond precision.
TOK_BACKFILL_SQL = f"""
WITH tok AS (
  SELECT doc_id, n_tok, CAST(n_tok AS DOUBLE) AS n_tok_d, source, ingest_ts
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_30000_seed42.parquet')
),
mm AS (SELECT MIN(n_tok_d) AS lo, MAX(n_tok_d) AS hi FROM tok),
att AS (
  SELECT t.*, e.src_quality
  FROM tok t
  ASOF LEFT JOIN (
    SELECT entity, event_ts, src_quality
    FROM read_parquet('{TOK_ORACLE_DIR}/events_seed42.parquet')
  ) e ON t.source = e.entity AND t.ingest_ts >= e.event_ts
),
lagged AS (
  SELECT *, lag(ingest_ts) OVER (PARTITION BY source ORDER BY ingest_ts, doc_id) AS prev_ts
  FROM att
),
sess AS (
  SELECT *, SUM(CASE WHEN prev_ts IS NOT NULL
                      AND date_diff('microsecond', prev_ts, ingest_ts) > 1800000000
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY source ORDER BY ingest_ts, doc_id
                  ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM lagged
)
SELECT source,
       COUNT(*) AS n_rows,
       CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok,
       round(AVG(LN(n_tok_d)), 6) AS avg_log_n_tok,
       round(AVG((n_tok_d - (SELECT lo FROM mm))
                 / ((SELECT hi FROM mm) - (SELECT lo FROM mm))), 6) AS avg_minmax_n_tok,
       round(AVG(n_tok_d), 6) AS avg_gbt_n_tok,
       round(AVG(src_quality), 6) AS avg_src_quality,
       round(AVG(CAST(session_idx AS DOUBLE)), 6) AS avg_session_idx
FROM sess
GROUP BY source
"""

# Resume-report oracle: the checkpointed rerun must compute all 4
# shards on pass 1 and skip all 4 on pass 2 — the report is a
# deterministic contract, so the oracle is the literal expected table.
TOK_RESUMABLE_SQL = """
SELECT * FROM (VALUES
  ('run1_computed', CAST(4 AS BIGINT)),
  ('run1_skipped',  CAST(0 AS BIGINT)),
  ('run2_computed', CAST(0 AS BIGINT)),
  ('run2_skipped',  CAST(4 AS BIGINT))) AS t(phase, n)
"""


# ---------------------------------------------------------------------------
# windows (rank family, cumulative), reshape, bloom join, curation rules


def fe_qcut(sf_dir: str):
    """Equal-frequency (quantile) discretization: 10 bins whose edges
    are the train distribution's discrete deciles from the mergeable
    sketch — the skew-robust sibling of the equal-width discretizer."""
    from ..functions.expr import quantile_discretize

    def build(f):
        return [quantile_discretize(f["l_extendedprice"], bins=10)]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_extendedprice"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"qcut[10](l_extendedprice)": "price_decile"},
    )


FE_QCUT_SQL = """
WITH e AS (
  SELECT percentile_disc(0.1) WITHIN GROUP (ORDER BY l_extendedprice) AS e1,
         percentile_disc(0.2) WITHIN GROUP (ORDER BY l_extendedprice) AS e2,
         percentile_disc(0.3) WITHIN GROUP (ORDER BY l_extendedprice) AS e3,
         percentile_disc(0.4) WITHIN GROUP (ORDER BY l_extendedprice) AS e4,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS e5,
         percentile_disc(0.6) WITHIN GROUP (ORDER BY l_extendedprice) AS e6,
         percentile_disc(0.7) WITHIN GROUP (ORDER BY l_extendedprice) AS e7,
         percentile_disc(0.8) WITHIN GROUP (ORDER BY l_extendedprice) AS e8,
         percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS e9
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       CAST((l_extendedprice > e.e1)::INT + (l_extendedprice > e.e2)::INT
          + (l_extendedprice > e.e3)::INT + (l_extendedprice > e.e4)::INT
          + (l_extendedprice > e.e5)::INT + (l_extendedprice > e.e6)::INT
          + (l_extendedprice > e.e7)::INT + (l_extendedprice > e.e8)::INT
          + (l_extendedprice > e.e9)::INT AS DOUBLE) AS price_decile
FROM lineitem CROSS JOIN e
"""


def d_chunk(sf_dir: str):
    """RAG-style document chunking: fixed 200-char windows with 50-char
    overlap (stride 150), emitted as (doc_id, chunk_idx, chunk) rows —
    pure row-local explode (numpy repeat + vectorized substring), zero
    shuffle; the count/length summary keeps the oracle result small."""
    from ray.data.aggregate import Count, Sum

    size, stride = 200, 150
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        ids = batch["doc_id"].to_numpy()
        lens = s.str.len().to_numpy(dtype=np.int64)
        n_chunks = np.maximum((np.maximum(lens - size, 0) + stride - 1) // stride, 0) + 1
        ridx = np.repeat(np.arange(len(s)), n_chunks)
        cidx = np.concatenate([np.arange(k) for k in n_chunks]) if len(s) else np.array([], dtype=np.int64)
        starts = cidx * stride
        texts = s.to_numpy()
        out_chunks = [texts[r][st : st + size] for r, st in zip(ridx, starts)]
        return pa.table({
            "doc_id": pa.array(ids[ridx]),
            "chunk_idx": pa.array(cidx.astype(np.int64)),
            "chunk_len": pa.array(
                np.array([len(c) for c in out_chunks], dtype=np.int64)
            ),
        })

    out = (
        ds.map_batches(chunks, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_chunks"), Sum("chunk_len", alias_name="sum_len"))
    )
    return out


D_CHUNK_SQL = """
WITH c AS (
  SELECT doc_id,
         unnest(generate_series(0,
            CAST(ceil(greatest(length(text) - 200, 0) / 150.0) AS INT))) AS chunk_idx,
         length(text) AS len
  FROM documents)
SELECT doc_id, count(*) AS n_chunks,
       CAST(sum(least(200, len - chunk_idx * 150)) AS BIGINT) AS sum_len
FROM c
GROUP BY doc_id
"""


def d_mutual_info(sf_dir: str):
    """Mutual information (nats) between document language and source —
    the distributed analog of the FairExp MI filter: per-batch Arrow
    contingency partials -> one cell-cardinality-sized hash aggregate
    -> closed form on the tiny table. Never shuffles rows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def part(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table({
            "lang": g["lang"], "source": g["source"], "n": g["count_all"],
        })

    cells = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = cells["n"].to_numpy(np.float64)
    total = n.sum()
    px = cells.groupby("lang")["n"].transform("sum").to_numpy(np.float64)
    py = cells.groupby("source")["n"].transform("sum").to_numpy(np.float64)
    mi = float(np.sum((n / total) * np.log(n * total / (px * py))))
    return pd.DataFrame({"mi": [round(mi, 9)]})


D_MUTUAL_INFO_SQL = """
WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
           FROM documents GROUP BY lang, source),
t AS (SELECT sum(n) AS total FROM c),
px AS (SELECT lang, sum(n) AS nx FROM c GROUP BY lang),
py AS (SELECT source, sum(n) AS ny FROM c GROUP BY source)
SELECT round(sum((c.n / t.total) * ln(c.n * t.total / (px.nx * py.ny))), 9) AS mi
FROM c JOIN px USING (lang) JOIN py USING (source) CROSS JOIN t
"""


def t_user_trend(sf_dir: str):
    """Per-user OLS trend of event value over time (grouped simple
    regression via the five-sufficient-statistics combiner,
    stages/regression.py). x is epoch seconds shifted to 2024-01-01 on
    BOTH sides (slope-invariant, kills the n·Σxx − Σx² cancellation)."""
    from ..stages.regression import grouped_ols

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"], split=True)

    def epochs(batch: pa.Table) -> pa.Table:
        t_ns = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[ns]")
        sec = t_ns.view(np.int64).astype(np.float64) / 1e9
        return pa.table({
            "user_id": batch["user_id"], "x": pa.array(sec), "value": batch["value"],
        })

    out = grouped_ols(
        ds.map_batches(epochs, batch_format="pyarrow"),
        key="user_id", x_col="x", y_col="value",
        x_shift=1704067200.0,  # epoch of 2024-01-01 00:00:00 UTC
    )
    return _round_cols(out, {"slope": 9, "intercept": 4})


def q_scd2(sf_dir: str):
    """Slowly-changing-dimension type 2 build from the event stream:
    per user, consecutive duplicate event_types collapse and each
    CHANGE opens a version with [valid_from, valid_to) microsecond
    bounds (valid_to -1 = still current). ONE entity-hash shuffle;
    inside a bucket everything is lexsort + shift across all the
    bucket's users at once. The warehouse-dimension primitive for
    replaying 'what was true at time T'."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"],
               split=True)

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        t = ts[order]
        et = g["event_type"].to_numpy(object)[order]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        change = new_user.copy()
        change[1:] |= et[1:] != et[:-1]
        cu, ct, cet = u[change], t[change], et[change]
        cnew = new_user[change]
        # next change within the same user closes the interval
        nxt = np.full(len(cu), -1, dtype=np.int64)
        same = np.zeros(len(cu), dtype=bool)
        if len(cu) > 1:
            same[:-1] = cu[1:] == cu[:-1]
            nxt[:-1][same[:-1]] = ct[1:][same[:-1]]
        # version index = running count within user
        grp_start = np.flatnonzero(cnew)
        ver = np.arange(len(cu), dtype=np.int64)
        ver -= np.repeat(grp_start, np.diff(np.r_[grp_start, len(cu)]))
        return pd.DataFrame({
            "user_id": cu, "version": ver + 1, "event_type": cet,
            "valid_from_us": ct, "valid_to_us": nxt,
            "is_current": nxt == -1,
        })

    out = grouped_map(ds, "user_id", versions).to_pandas()
    return out.sort_values(["user_id", "version"]).reset_index(drop=True)


Q_SCD2_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
chg AS (
  SELECT user_id, event_type, ts, event_id
  FROM o WHERE prev IS NULL OR prev <> event_type)
SELECT user_id,
       row_number() OVER w AS version,
       event_type,
       epoch_us(ts) AS valid_from_us,
       COALESCE(epoch_us(lead(ts) OVER w), -1) AS valid_to_us,
       (lead(ts) OVER w IS NULL) AS is_current
FROM chg
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
"""


def t_running_total(sf_dir: str):
    """GLOBAL running total of event value over (ts, event_id) — no
    partition key, so this is the two-pass prefix-offset layout
    (stages/partition.py:ordered_cumsum): per-hour partial-sum cells to
    the driver, exclusive prefix, one bucket exchange with an in-bucket
    C-level cumsum. Integer cents avoid float-order drift entirely —
    the running sum is exact in both engines."""
    from ..stages.partition import ordered_cumsum

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "value"], split=True)

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        # floor(x+0.5), NOT np.rint: rint is half-to-even while SQL
        # round() is half-away — they disagree on exact half-cent
        # products; floor+0.5 (values are non-negative) matches the
        # oracle's identical formula by construction
        cents = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"],
            "hour": pc.divide(us, pa.scalar(3_600_000_000)),
            "ts_us": us,
            "cents": pa.array(cents),
        })

    out = ordered_cumsum(
        ds.map_batches(prep, batch_format="pyarrow"),
        range_col="hour", order_cols=["ts_us", "event_id"],
        value_col="cents", out_col="running_cents",
    ).to_pandas()[["event_id", "running_cents"]]
    return out.sort_values("event_id").reset_index(drop=True)


T_RUNNING_TOTAL_SQL = """
SELECT event_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS running_cents
FROM events
ORDER BY event_id
"""


def d_shard_plan(sf_dir: str):
    """Token-balanced output-shard planner: global running token count
    over doc_id order (same two-pass ordered_cumsum), then
    shard = (cum - 1) // target so every shard holds ~target tokens
    regardless of document size skew — the layout step before writing
    training shards. Returns the per-shard manifest (docs, tokens,
    doc_id range)."""
    from ..stages.partition import ordered_cumsum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        return pa.table({
            "doc_id": batch["doc_id"],
            "blk": pc.divide(batch["doc_id"], pa.scalar(64, type=pa.int64())),
            "n_tok": pa.array(s.str.count(r"\S+").to_numpy(np.int64)),
        })

    cum = ordered_cumsum(
        ds.map_batches(prep, batch_format="pyarrow"),
        range_col="blk", order_cols=["doc_id"], value_col="n_tok",
        out_col="cum_tok",
    )
    target = 2000

    def assign(batch: pa.Table) -> pa.Table:
        c = batch["cum_tok"].to_numpy()
        return pa.table({
            "doc_id": batch["doc_id"], "n_tok": batch["n_tok"],
            "shard": pa.array(np.maximum(c - 1, 0) // target),
        })

    from ray.data.aggregate import Count, Max, Min, Sum

    out = (
        cum.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tok", alias_name="tokens"),
            Min("doc_id", alias_name="first_doc"),
            Max("doc_id", alias_name="last_doc"),
        )
        .to_pandas()
    )
    return out.sort_values("shard").reset_index(drop=True)


D_SHARD_PLAN_SQL = """
WITH n AS (
  SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tok FROM documents),
c AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM n)
SELECT CAST(greatest(cum - 1, 0) // 2000 AS BIGINT) AS shard,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1 ORDER BY shard
"""


def t_seasonality(sf_dir: str):
    """Hour-of-day × event-type seasonality profile (the calendar
    EXTRACT family): row-local hour index, one O(types×24) cell
    exchange, per-cell count + quantized mean value."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        hour = (us // 3_600_000_000) % 24
        v = batch["value"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "hour": hour.astype(np.int64),
            "n": 1,
            # SQL-avg parity: count(*) counts every row, avg() divides
            # by the NON-NULL count — track both
            "vn": (~pd.isna(v)).astype(np.int64),
            "vsum": np.nan_to_num(v, nan=0.0),
        })
        return pa.Table.from_pandas(
            df.groupby(["event_type", "hour"], as_index=False).sum(),
            preserve_index=False,
        )

    out = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("vn", alias_name="vn"),
                   Sum("vsum", alias_name="vsum"))
        .to_pandas()
    )
    vn = out.pop("vn").to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        avg = out.pop("vsum") / vn  # all-NULL cell -> NaN, like SQL avg()
    out["avg_value"] = np.floor(avg * 1e6 + 0.5005) / 1e6
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


T_SEASONALITY_SQL = """
SELECT event_type,
       (epoch_us(ts) // 3600000000) % 24 AS hour,
       count(*) AS n,
       floor(avg(value) * 1000000 + 0.5005) / 1000000 AS avg_value
FROM events
GROUP BY event_type, hour
ORDER BY event_type, hour
"""


def t_late_events(sf_dir: str):
    """Out-of-order arrival detection (the streaming watermark
    question): an event is LATE if its timestamp precedes the running
    maximum over earlier event_ids of the same user. One entity
    shuffle; the running max is a C-level grouped cummax. Returns the
    per-user late count and first late event id (only users with
    late events). The fixture's timestamps are perfectly ordered, so a
    deterministic slice (event_id % 37 == 5) is shifted 45 minutes into
    the past in BOTH engines — the detection path runs on real
    out-of-order data."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"], split=True)

    def inject(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        eid = batch["event_id"].to_numpy()
        shifted = np.where(eid % 37 == 5, us - 45 * 60 * 1_000_000, us)
        return pa.table({
            "event_id": batch["event_id"],
            "ts": pa.array(shifted.astype("datetime64[us]")),
            "user_id": batch["user_id"],
        })

    ds = ds.map_batches(inject, batch_format="pyarrow")

    def late(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"], kind="stable")
        run = g.groupby("user_id", sort=False)["ts"].cummax()
        is_late = g["ts"].to_numpy() < run.to_numpy()
        lg = g.loc[is_late]
        if not len(lg):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_late": pd.Series([], dtype=np.int64),
                "first_late": pd.Series([], dtype=np.int64),
            })
        agg = lg.groupby("user_id")["event_id"].agg(["size", "min"]).reset_index()
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(np.int64),
            "n_late": agg["size"].to_numpy(np.int64),
            "first_late": agg["min"].to_numpy(np.int64),
        })

    out = grouped_map(ds, "user_id", late).to_pandas()
    if "user_id" not in out.columns:  # all buckets empty -> schemaless
        out = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                            "n_late": pd.Series([], dtype=np.int64),
                            "first_late": pd.Series([], dtype=np.int64)})
    return out.sort_values("user_id").reset_index(drop=True)


T_LATE_EVENTS_SQL = """
WITH e AS (
  SELECT user_id, event_id,
         CASE WHEN event_id % 37 = 5 THEN ts - INTERVAL 45 MINUTE
              ELSE ts END AS ts
  FROM events),
r AS (
  SELECT user_id, event_id, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
  FROM e)
SELECT user_id, count(*) AS n_late, min(event_id) AS first_late
FROM r WHERE ts < runmax
GROUP BY user_id ORDER BY user_id
"""


def t_json_extract(sf_dir: str):
    """Semi-structured extraction from the event payload column: pull
    the integer field k out of the JSON props string with one
    vectorized regex per batch (no JSON-library dependency — the same
    RE2-compatible pattern runs in the oracle), then aggregate per
    event_type. Rows with a missing/malformed field count as NULL.
    The log-processing primitive: schema-on-read over a string column."""
    from ray.data.aggregate import Count, Max, Mean, Min

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["props"].to_pandas())
        k = s.str.extract(r'"k": (\d+)', expand=False).astype("Int64")
        return pa.table({
            "event_type": batch["event_type"],
            "k": pa.array(k, from_pandas=True),
        })

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Min("k", alias_name="k_min"),
            Max("k", alias_name="k_max"),
            Mean("k", alias_name="k_mean"),
        )
        .to_pandas()
    )
    out["k_mean"] = np.floor(out["k_mean"] * 1e6 + 0.5005) / 1e6
    return out.sort_values("event_type").reset_index(drop=True)


T_JSON_EXTRACT_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '') AS BIGINT) AS k
  FROM events)
SELECT event_type, count(*) AS n,
       min(k) AS k_min, max(k) AS k_max,
       floor(avg(k) * 1000000 + 0.5005) / 1000000 AS k_mean
FROM e GROUP BY event_type ORDER BY event_type
"""


def t_rolling_centered(sf_dir: str):
    """CENTERED rolling mean (ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
    per user — the smoothing/denoising window shape, vs the trailing
    frames of t_rolling. One entity shuffle; pandas rolling(center=True,
    min_periods=1) matches the SQL frame's edge clamping exactly."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        m = (g.groupby("user_id", sort=False)["value"]
              .rolling(window=5, center=True, min_periods=1).mean()
              .reset_index(drop=True))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "centered_mean": np.floor(m.to_numpy(np.float64) * 1e6 + 0.5005) / 1e6,
        })

    out = grouped_map(ds, "user_id", roll).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


T_ROLLING_CENTERED_SQL = """
SELECT event_id,
       floor(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
             * 1000000 + 0.5005) / 1000000 AS centered_mean
FROM events
ORDER BY event_id
"""


def d_split_leakage(sf_dir: str):
    """Train/test leakage audit: with a NAIVE row-level split (doc_id
    hash — the mistake d_group_split exists to prevent), count texts
    that appear on BOTH sides. Injection: doc_id%9==2 clones at
    +10,000,001 ids (the ODD offset flips the split digit, so clones
    really do cross sides), planting real leaks. ONE scan: per-batch
    (text-hash, seen_train, seen_valid, per-side row counts) cells —
    the exchange carries distinct-text cells, never bodies (the hash
    is 64-bit; as with d_decontaminate, the exact-text SQL oracle also
    guards the hash path against collisions)."""
    from ray.data.aggregate import Max, Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        txt = batch["text"].to_pandas().to_numpy(object)
        hit = np.flatnonzero(ids % 9 == 2)
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, ids[hit] + 10_000_001])),
            "text": pa.array(np.concatenate([txt, txt[hit]]), type=pa.string()),
        })

    both = ds.map_batches(inject, batch_format="pyarrow")

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        txt = pd.Series(batch["text"].to_pandas()).fillna("")
        train = ids % 10 < 8
        df = pd.DataFrame({
            "h": pd.util.hash_array(txt.to_numpy(object)).astype(np.int64),
            "tr": train.astype(np.int64),
            "va": (~train).astype(np.int64),
        })
        # Max-merged side flags AND Sum-merged row counts from the same
        # pass — the pipeline scans the documents table exactly once
        agg = df.groupby("h", as_index=False).agg(
            tr=("tr", "max"), va=("va", "max"),
            n_tr=("tr", "sum"), n_va=("va", "sum"),
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    sides = (
        both.map_batches(cells, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Max("tr", alias_name="tr"), Max("va", alias_name="va"),
                   Sum("n_tr", alias_name="n_tr"), Sum("n_va", alias_name="n_va"))
    )
    def final_partial(t: pa.Table) -> pa.Table:
        tr = t["tr"].to_numpy()
        va = t["va"].to_numpy()
        return pa.table({
            "leak": pa.array([int(((tr == 1) & (va == 1)).sum())]),
            "n_tr": pa.array([int(t["n_tr"].to_numpy().sum())]),
            "n_va": pa.array([int(t["n_va"].to_numpy().sum())]),
        })

    tab = sides.map_batches(final_partial, batch_format="pyarrow").to_pandas().sum()
    return pd.DataFrame({
        "n_leaked_texts": [int(tab["leak"])],
        "n_train": [int(tab["n_tr"])],
        "n_valid": [int(tab["n_va"])],
    })


D_SPLIT_LEAKAGE_SQL = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000001 AS doc_id, text FROM documents WHERE doc_id % 9 = 2),
s AS (
  SELECT doc_id, COALESCE(text, '') AS text,
         CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'valid' END AS split
  FROM d),
l AS (SELECT text FROM s GROUP BY text HAVING count(DISTINCT split) = 2)
SELECT (SELECT count(*) FROM l) AS n_leaked_texts,
       (SELECT count(*) FROM s WHERE split = 'train') AS n_train,
       (SELECT count(*) FROM s WHERE split = 'valid') AS n_valid
"""


def t_anomaly(sf_dir: str):
    """Per-user z-score anomaly detection on event values: flag rows
    more than 2.5 sample standard deviations from the user's own mean
    (the monitoring/outlier-quarantine primitive). ONE entity-hash
    shuffle co-locates each user; inside a bucket the mean/std are
    C-level pandas groupby transforms across all of the bucket's users
    at once. Users with fewer than two events (std undefined) and
    zero-variance users emit nothing."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"], split=True)

    def z(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("user_id")["value"]
        mu = grp.transform("mean").to_numpy(np.float64)
        sd = grp.transform("std").to_numpy(np.float64)  # ddof=1 = stddev_samp
        val = g["value"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            zs = (val - mu) / sd
            hit = (sd > 0) & (np.abs(zs) > 2.5)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[hit],
            "user_id": g["user_id"].to_numpy(np.int64)[hit],
            "value": val[hit],
            "z": np.round(zs[hit], 6),
        })

    out = grouped_map(ds, "user_id", z).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


T_ANOMALY_SQL = """
WITH s AS (
  SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY user_id)
SELECT e.event_id, e.user_id, e.value,
       round((e.value - s.mu) / s.sd, 6) AS z
FROM events e JOIN s USING (user_id)
WHERE s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 2.5
ORDER BY e.event_id
"""


T_USER_TREND_SQL = """
SELECT user_id, count(*) AS n,
       round(regr_slope(value, epoch(ts) - 1704067200), 9) AS slope,
       round(regr_intercept(value, epoch(ts) - 1704067200), 4) AS intercept
FROM events
GROUP BY user_id
"""


def t_session_stats(sf_dir: str):
    """Session-level aggregate table: sessionize (gap 30 min), then one
    hash aggregate per (user, session) — events per session, exact
    integer-microsecond duration, value sum."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages.temporal import sessionize

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)
    sess = sessionize(ds, key="user_id", ts="ts", gap=1800, tiebreak=["event_id"])

    def epoch_us(batch: pa.Table) -> pa.Table:
        t_us = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view(np.int64)
        )
        return pa.table({
            "user_id": batch["user_id"], "session_idx": batch["session_idx"],
            "t_us": pa.array(t_us), "value": batch["value"],
        })

    out = (
        sess.map_batches(epoch_us, batch_format="pyarrow")
        .groupby(["user_id", "session_idx"])
        .aggregate(
            Count(alias_name="n_events"),
            Min("t_us", alias_name="t0"),
            Max("t_us", alias_name="t1"),
            Sum("value", alias_name="sum_value"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        dur = batch["t1"].to_numpy() - batch["t0"].to_numpy()
        return pa.table({
            "user_id": batch["user_id"], "session_idx": batch["session_idx"],
            "n_events": batch["n_events"],
            "duration_us": pa.array(dur.astype(np.int64)),
            "sum_value": pc.round(batch["sum_value"], ndigits=6),
        })

    return out.map_batches(finish, batch_format="pyarrow")


T_SESSION_STATS_SQL = """
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) - 1
              AS BIGINT) AS session_idx
  FROM lagged)
SELECT user_id, session_idx, count(*) AS n_events,
       CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us,
       round(sum(value), 6) AS sum_value
FROM sess
GROUP BY user_id, session_idx
"""


T_EWMA_SQL = """
-- EWMA (adjust=False recursion s_t = (1-a)s_{t-1} + a x_t) has the
-- closed form s_t = (1-a)^t x_0 + a Σ_{i=1..t} (1-a)^{t-i} x_i, which a
-- plain cumulative window sum expresses after factoring out (1-a)^t:
--   s_t = (1-a)^t * cumsum_i( x_0 if i=0 else a * x_i / (1-a)^i ).
-- (1/0.7)^rn stays finite to rn≈1988 and per-user event counts are
-- ~100 at these scale factors; both engines round to 6dp.
-- quantization: 2dp inputs × terminating-decimal weights mean true EWMA
-- values land EXACTLY on .5e-6 boundaries, where the two engines'
-- ~1e-12 float disagreement flips a plain round(x, 6); the biased
-- half-up floor(x*1e6 + 0.5005)/1e6 absorbs that (bias 5e-4 scaled
-- ≫ inter-engine error 1e-6 scaled, ≪ quantum 1) — the Ray side
-- applies the identical formula.
WITH ordered AS (
  SELECT event_id, user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events),
weighted AS (
  SELECT event_id, user_id, rn,
         CASE WHEN rn = 0 THEN value
              ELSE 0.3 * value * power(1.0 / 0.7, rn) END AS wv
  FROM ordered)
SELECT event_id,
       floor((power(0.7, rn)
              * SUM(wv) OVER (PARTITION BY user_id ORDER BY rn
                              ROWS UNBOUNDED PRECEDING)) * 1000000 + 0.5005)
       / 1000000 AS ewma_value
FROM weighted
ORDER BY event_id
"""


def t_ewma(sf_dir: str):
    """Per-user exponential moving average of event value (alpha 0.3,
    pandas ewm(adjust=False) recursion) — sequential per entity, so one
    entity-hash shuffle co-locates each user and the C-level ewm kernel
    runs per segment. SQL oracle uses the closed-form cumulative-window
    rewrite (see T_EWMA_SQL); rounded to 6dp in both engines because the
    recursion and the closed form differ in last-bit float association.
    Pytest additionally checks against an independent Python recursion."""
    from ..stages.temporal import ewma

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)
    out = ewma(
        ds, key="user_id", ts="ts", col="value", alpha=0.3,
        out_col="ewma_value", tiebreak=["event_id"],
    )
    pdf = out.to_pandas()[["event_id", "ewma_value"]]
    # biased half-up quantizer, identical formula in T_EWMA_SQL — see
    # the oracle comment for why round(x, 6) is not boundary-safe here
    pdf["ewma_value"] = np.floor(pdf["ewma_value"] * 1e6 + 0.5005) / 1e6
    return pdf.sort_values("event_id").reset_index(drop=True)


def q_rollup(sf_dir: str):
    """ROLLUP (flag, status) aggregate: one streaming pass produces the
    finest level; the coarser levels (per-flag, grand total) re-aggregate
    the FINEST-LEVEL result, which is group-cardinality-sized — never a
    second pass over rows. NULL marks the rolled-up dimension, as in
    SQL ROLLUP."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    fine = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty"))
        .to_pandas()
    )
    per_flag = (
        fine.groupby("l_returnflag", as_index=False)[["n", "sum_qty"]].sum()
    )
    per_flag["l_linestatus"] = None
    total = pd.DataFrame({
        "l_returnflag": [None], "l_linestatus": [None],
        "n": [fine["n"].sum()], "sum_qty": [fine["sum_qty"].sum()],
    })
    out = pd.concat([fine, per_flag, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "n", "sum_qty"]
    ]
    out["sum_qty"] = out["sum_qty"].round(6)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 6) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_corr(sf_dir: str):
    """Pairwise Pearson correlation matrix over four lineitem measures
    in ONE streaming pass (stages/stats.py:correlation_matrix — per
    batch only (n, sums, X^T X) = O(k^2) floats leave the stream; no
    shuffle). Population/sample normalization cancels, so equals SQL
    corr() exactly."""
    from ..stages.stats import correlation_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", columns=cols)
    out = correlation_matrix(ds, cols)
    out["corr"] = out["corr"].round(6)
    return out


Q_CORR_SQL = """
SELECT col_a, col_b, round(corr(a, b), 6) AS corr FROM (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
         l_quantity AS a, l_extendedprice AS b FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_discount', l_quantity, l_discount FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_tax', l_quantity, l_tax FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_discount', l_extendedprice, l_discount FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_tax', l_extendedprice, l_tax FROM lineitem
  UNION ALL SELECT 'l_discount', 'l_tax', l_discount, l_tax FROM lineitem
)
GROUP BY col_a, col_b
"""


def d_cms_counts(sf_dir: str):
    """Approximate token counts via a count-min sketch (the linear
    sketch whose depth x width partials merge by addition — the
    100TB path where the exact vocabulary aggregate stops fitting).
    Point-queries the corpus's exact top-10 tokens; estimates only
    overcount, by <= e/width of total token mass. The sketch's hash
    family is the REPLAYABLE affine-over-Horner pair family
    (stages/sketch.py:CMS_A/CMS_B), so the SQL oracle rebuilds the
    identical depth x width table and reproduces every estimate
    exactly — an approximate estimator CAN be value-verified when its
    randomness is deterministic and public. Pytest keeps the
    over-count-envelope check against exact counts."""
    from ..stages.sketch import cms_token_counts
    from ..stages.text import top_tokens

    ds = _read(sf_dir, "documents", columns=["text"])
    top = top_tokens(ds, k=10).to_pandas()
    out = cms_token_counts(
        _read(sf_dir, "documents", columns=["text"]),
        query_tokens=top["token"].tolist(),
    )
    return out.sort_values("token").reset_index(drop=True)


D_CMS_COUNTS_SQL = """
WITH RECURSIVE tok AS (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents),
counts AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
pw(k, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (v * 1000003) % 2305843009213693951 FROM pw
  WHERE k < (SELECT COALESCE(max(length(t)), 0) FROM counts)),
ch AS (
  SELECT t, length(t) AS L,
         unnest(regexp_extract_all(t, '.')) AS cc,
         generate_subscripts(regexp_extract_all(t, '.'), 1) AS j
  FROM counts),
h AS (
  SELECT t, CAST(SUM(CAST(ord(cc) AS HUGEINT) * pw.v)
                 % 2305843009213693951 AS BIGINT) AS hw
  FROM ch JOIN pw ON pw.k = L - j GROUP BY t),
depths(d, a, b) AS (
  VALUES (0, 1000003, 0), (1, 998244353, 1000000007),
         (2, 754974721, 2000000014), (3, 167772161, 3000000021)),
pos AS (
  SELECT h.t, depths.d,
         CAST(((CAST(h.hw AS HUGEINT) * depths.a) % 2305843009213693951
               + depths.b) % 2305843009213693951 % 16384 AS BIGINT) AS pos
  FROM h CROSS JOIN depths),
cells AS (
  SELECT pos.d, pos.pos, SUM(counts.c) AS cell
  FROM pos JOIN counts USING (t) GROUP BY pos.d, pos.pos),
top10 AS (SELECT t, c FROM counts ORDER BY c DESC, t LIMIT 10)
SELECT top10.t AS token, CAST(MIN(cells.cell) AS BIGINT) AS approx_n
FROM top10
JOIN pos ON pos.t = top10.t
JOIN cells ON cells.d = pos.d AND cells.pos = pos.pos
GROUP BY top10.t
ORDER BY token
"""


def fe_robust(sf_dir: str):
    """Robust scaling (x - median)/IQR — quartiles learned by the
    mergeable weighted-value sketch (percentile_disc semantics with the
    64k per-partial cap: oracle-exact while per-block distinct counts
    stay under it, bounded rank error beyond; documented divergence
    from sklearn's interpolated quantiles)."""
    from ..functions.expr import robust_scale

    def build(f):
        return [robust_scale(f["l_extendedprice"])]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_extendedprice"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"robust(l_extendedprice)": "robust_price"},
        rounding={"robust_price": 6},
    )


FE_ROBUST_SQL = """
WITH q AS (
  SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS med,
         percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS q25,
         percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS q75
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       round((l_extendedprice - (SELECT med FROM q))
             / ((SELECT q75 FROM q) - (SELECT q25 FROM q)), 6) AS robust_price
FROM lineitem
"""


def fe_ranknorm(sf_dir: str):
    """Rank/CDF normalization: x -> P(value <= x) over the fitted
    distribution — SQL cume_dist(). Exact here because l_quantity's
    per-batch distinct count is far under the sketch cap."""
    from ..functions.expr import rank_normalize

    def build(f):
        return [rank_normalize(f["l_quantity"])]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_quantity"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"ranknorm(l_quantity)": "qty_cdf"},
        rounding={"qty_cdf": 9},
    )


FE_RANKNORM_SQL = """
SELECT l_orderkey, l_linenumber,
       round(cume_dist() OVER (ORDER BY l_quantity), 9) AS qty_cdf
FROM lineitem
"""


def fe_target_encode(sf_dir: str):
    """Smoothed mean target encoding of order priority by order value
    (m = 20 pseudo-observations of the global mean — Micci-Barreca
    shrinkage): per-key mergeable partials + one global scalar, applied
    as a broadcast lookup."""
    from ..functions.expr import target_encode

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderpriority"])
    price = raw("o_totalprice", properties={"min": 0.0, "max": 1e9})
    prio = raw("o_orderpriority", "categorical", {"distinct": 5})
    plans = [target_encode(price, prio, m=20.0)]
    fitted = fit_distributed(plans, ds)
    out = backfill_dataset(ds, plans, fitted)
    out = _rename(out, {plans[0].name: "prio_tenc"})
    out = _round_cols(out, {"prio_tenc": 4})
    return out.select_columns(["o_orderkey", "prio_tenc"])


FE_TARGET_ENCODE_SQL = """
WITH g AS (
  SELECT o_orderpriority, sum(o_totalprice) AS s, count(*) AS c
  FROM orders GROUP BY o_orderpriority),
gm AS (SELECT avg(o_totalprice) AS m FROM orders)
SELECT o.o_orderkey,
       round((g.s + 20.0 * (SELECT m FROM gm)) / (g.c + 20.0), 4) AS prio_tenc
FROM orders o JOIN g USING (o_orderpriority)
"""


def t_cumsum(sf_dir: str):
    """Per-user CUMULATIVE (expanding-frame) running sum ordered by
    (ts, event_id) — ROWS UNBOUNDED PRECEDING; same one-shuffle
    prefix-sum machinery as the rolling windows."""
    from ..stages.temporal import rolling_agg

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)
    out = rolling_agg(
        ds, key="user_id", ts="ts", col="value", window=0, expanding=True,
        agg="sum", out_col="cum_value", tiebreak=["event_id"],
    )
    return _round_cols(out.select_columns(["event_id", "cum_value"]), {"cum_value": 6})


T_CUMSUM_SQL = """
SELECT event_id,
       round(sum(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_value
FROM events
"""


def t_ntile(sf_dir: str):
    """Rank-family windows per user ordered by (ts, event_id):
    NTILE(4), PERCENT_RANK, CUME_DIST in one pass
    (stages/temporal.py:window_rank — per-segment vectorized
    arithmetic, no per-key Python)."""
    from ..stages.temporal import window_rank

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"], split=True)
    out = window_rank(ds, key="user_id", ts="ts", ntile=4, tiebreak=["event_id"])
    return _round_cols(
        out.select_columns(["event_id", "ntile", "percent_rank", "cume_dist"]),
        {"percent_rank": 9, "cume_dist": 9},
    )


T_NTILE_SQL = """
SELECT event_id,
       CAST(ntile(4) OVER w AS BIGINT) AS ntile,
       round(percent_rank() OVER w, 9) AS percent_rank,
       round(cume_dist() OVER w, 9) AS cume_dist
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_pivot(sf_dir: str):
    """Pivot (long -> wide): sum of l_quantity per return flag, one
    column per line status (stages/reshape.py:pivot_wide — per-batch
    Arrow partial aggregate, one tiny merge, index-sized wide frame)."""
    from ..stages.reshape import pivot_wide

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    out = pivot_wide(
        ds, index_col="l_returnflag", pivot_col="l_linestatus",
        value_col="l_quantity", agg="sum", prefix="qty_",
    )
    for c in out.columns:
        if c != "l_returnflag":
            out[c] = out[c].round(6)
    return out


Q_PIVOT_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS qty_F,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6) AS qty_O
FROM lineitem
GROUP BY l_returnflag
"""


def q_unpivot(sf_dir: str):
    """Unpivot/melt (wide -> long): three lineitem measures exploded to
    (variable, value) rows — pure row-local flat map, zero shuffle —
    then a small per-variable aggregate."""
    from ray.data.aggregate import Count, Sum

    from ..stages.reshape import unpivot

    ds = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"]
    )
    long = unpivot(
        ds, id_cols=["l_orderkey"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount"],
    )
    out = long.groupby("variable").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )
    return _round_cols(out, {"sum_value": 4})


Q_UNPIVOT_SQL = """
SELECT variable, count(*) AS n, round(sum(value), 4) AS sum_value
FROM (
  SELECT 'l_quantity' AS variable, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT 'l_discount', l_discount FROM lineitem
)
GROUP BY variable
"""


def q_bloom_semi_join(sf_dir: str):
    """Semi join with a Bloom-filter pre-filter (stages/bloom.py):
    bits at ~10 bits/key ship to every task (10-60x smaller than the
    sorted key array — the broadcast that still fits at 10^9 keys);
    the exact sorted-array verify touches only the ~1%-fp
    bloom-positive subset. Result is exactly the semi join, so the
    SQL oracle is exact."""
    import ray
    from ray.data.aggregate import Count

    from ..stages.bloom import BloomFilter

    keys = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"],
              where=pc.field("o_totalprice") > 250000.0)
        .to_pandas()["o_orderkey"]
        .to_numpy()
    )
    bloom_ref = ray.put(BloomFilter.build(keys))
    exact_ref = ray.put(np.sort(keys))
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def semi(batch: pa.Table) -> pa.Table:
        from ..stages.arrowutil import sorted_lookup

        k = batch["l_orderkey"].to_numpy()
        maybe = ray.get(bloom_ref).contains(k)
        cand = np.flatnonzero(maybe)
        if len(cand) == 0:
            return batch.slice(0, 0)
        _, found = sorted_lookup(ray.get(exact_ref), k[cand])
        return batch.take(pa.array(cand[found]))

    return (
        ds.map_batches(semi, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Count(alias_name="n"))
    )


Q_BLOOM_SEMI_JOIN_SQL = """
SELECT l_returnflag, count(*) AS n
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 250000.0)
GROUP BY l_returnflag
"""


def d_stratified_sample(sf_dir: str):
    """Exact-n-per-stratum deterministic sample: 10 documents per
    source, ordered by a Fibonacci-hash key both engines can compute
    ((doc_id * 2654435761) % 2^32 — bijective mod 2^32, so keys are
    unique and the sample is total-order deterministic across runs and
    cluster sizes). Uses the grouped_topn local-combiner (each batch
    contributes <= n rows per stratum to the exchange)."""
    from ..stages.sampling import det_hash_u32, grouped_topn

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def keyed(batch: pa.Table) -> pa.Table:
        # seed=0 makes det_hash_u32's multiplier the bare Knuth constant,
        # exactly the SQL oracle's (doc_id * 2654435761) % 2^32
        k = det_hash_u32(batch["doc_id"].to_numpy(), seed=0).astype(np.int64)
        return batch.append_column("__key", pa.array(k))

    out = grouped_topn(
        ds.map_batches(keyed, batch_format="pyarrow"),
        key_col="source", order_col="__key", n=10, descending=False,
    )
    return (
        out.to_pandas()[["doc_id", "source"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


D_STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, source
FROM documents
QUALIFY row_number() OVER (
    PARTITION BY source ORDER BY (doc_id * 2654435761) % 4294967296) <= 10
ORDER BY doc_id
"""


def d_c4_filter(sf_dir: str):
    """C4/RefinedWeb-style rule-based document filter (doc-level
    rules): word count in [30, 10000], mean word length <= 4.6, no
    curly brace, no 'lorem ipsum'. Vectorized pandas-str mask per
    batch, streaming filter, per-source survivor count."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def rules(batch: pa.Table) -> pa.Table:
        from ..stages.text import c4_keep_mask

        s = pd.Series(batch["text"].to_pandas()).fillna("")
        return batch.filter(pa.array(c4_keep_mask(s)))

    return (
        ds.map_batches(rules, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Count(alias_name="n_kept"))
    )


D_C4_FILTER_SQL = """
SELECT source, count(*) AS n_kept
FROM documents
WHERE length(regexp_extract_all(text, '\\S+')) BETWEEN 30 AND 10000
  AND length(regexp_replace(text, '\\s+', '', 'g'))
      / greatest(length(regexp_extract_all(text, '\\S+')), 1) <= 4.6
  AND position('{' IN text) = 0
  AND position('lorem ipsum' IN lower(text)) = 0
GROUP BY source
"""


def d_gopher_filter(sf_dir: str):
    """Gopher/MassiveText rule-based quality report per source: doc
    counts, per-rule failure counts, and survivors (rules in
    stages/text.py:gopher_rule_flags). The synthetic corpus violates
    some rules uniformly (no '#', no 'of/and/that' stop words), so a
    deterministic doc_id%13 slice is rewritten identically in both
    engines: slice 3 becomes a degenerate numeric doc (fails word
    count, word length, alpha, stop), slice 5 gets 200 '#' symbol
    words appended (fails symbol ratio + alpha fraction), everything
    else gets ' the of and' so the stop rule can pass. Per-batch
    pandas-groupby partials make the exchange O(sources), not O(docs)."""
    from ray.data.aggregate import Sum

    from ..stages.text import gopher_rule_flags

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        txt = pd.Series(batch["text"].to_pandas()).fillna("")
        m = ids % 13
        txt = txt.where(m != 3, "9 9 9")
        txt = txt.where(m != 5, txt + (" #" * 200))
        txt = txt.where((m == 3) | (m == 5), txt + " the of and")
        flags = gopher_rule_flags(txt)
        flags["source"] = batch["source"].to_pandas().values
        flags["n_docs"] = 1
        agg = flags.groupby("source", as_index=False).sum()
        agg["n_kept"] = agg.pop("keep")
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("fail_wc", alias_name="fail_wc"),
            Sum("fail_mwl", alias_name="fail_mwl"),
            Sum("fail_sym", alias_name="fail_sym"),
            Sum("fail_alpha", alias_name="fail_alpha"),
            Sum("fail_stop", alias_name="fail_stop"),
        )
    )
    return out.to_pandas().sort_values("source").reset_index(drop=True)


D_GOPHER_FILTER_SQL = """
WITH d AS (
  SELECT source,
         CASE WHEN doc_id % 13 = 3 THEN '9 9 9'
              WHEN doc_id % 13 = 5 THEN text || repeat(' #', 200)
              ELSE text || ' the of and' END AS text
  FROM documents),
m AS (
  SELECT source,
         len(regexp_extract_all(text, '\\S+')) AS wc,
         length(regexp_replace(text, '\\s+', '', 'g')) AS nonws,
         length(text) - length(replace(text, '#', ''))
           + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym,
         len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS n_alpha,
         (CASE WHEN position(' the '  IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' be '   IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' to '   IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' of '   IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' and '  IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' that ' IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' have ' IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END
        + CASE WHEN position(' with ' IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END) AS n_stop
  FROM d),
f AS (
  SELECT source,
         (wc < 50 OR wc > 100000) AS fail_wc,
         (nonws / greatest(wc, 1) < 3.0 OR nonws / greatest(wc, 1) > 10.0) AS fail_mwl,
         (n_sym > 0.1 * wc) AS fail_sym,
         (n_alpha < 0.8 * wc) AS fail_alpha,
         (n_stop < 2) AS fail_stop
  FROM m)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN NOT (fail_wc OR fail_mwl OR fail_sym OR fail_alpha
                               OR fail_stop) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN fail_wc THEN 1 ELSE 0 END) AS BIGINT) AS fail_wc,
       CAST(sum(CASE WHEN fail_mwl THEN 1 ELSE 0 END) AS BIGINT) AS fail_mwl,
       CAST(sum(CASE WHEN fail_sym THEN 1 ELSE 0 END) AS BIGINT) AS fail_sym,
       CAST(sum(CASE WHEN fail_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
       CAST(sum(CASE WHEN fail_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop
FROM f GROUP BY source ORDER BY source
"""


def q_left_join(sf_dir: str):
    """LEFT OUTER equi-join: every customer row survives, order payload
    is NULL where no order matched. Routed through the strategy planner
    (stages/partition.py:auto_join): the right side's metadata row
    count is under the broadcast bound at test scale, so this resolves
    to broadcast_join (zero shuffle of the left stream); at production
    row counts the same call dispatches to the bucketed shuffle join,
    whose outer semantics are per-bucket-correct (both sides of a key
    co-locate)."""
    from ..stages.partition import auto_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    return auto_join(
        cust, orders, left_on="c_custkey", right_on="o_custkey",
        join_type="left outer",
    )


Q_LEFT_JOIN_SQL = """
SELECT c_custkey, c_acctbal, o_totalprice
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
"""


def q_full_outer_join(sf_dir: str):
    """FULL OUTER join of two filtered streams (big orders x rich
    customers): unmatched rows of BOTH sides survive with NULL payload
    from the other. The bucketed join's union-pad-shuffle layout makes
    this the same single exchange as the inner case; pyarrow coalesces
    the key, so unmatched right rows carry their own key value."""
    from ..stages.partition import shuffle_hash_join

    # both predicates push into the scan (row-group pruning at the
    # read); acctbal is dropped right after the reader — a metadata
    # projection — so it never ships through the join exchange
    big = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
        where=pc.field("o_totalprice") > 150000.0,
    )
    rich = _read(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"],
        where=pc.field("c_acctbal") > 5000.0,
    ).select_columns(["c_custkey", "c_mktsegment"])
    joined = shuffle_hash_join(
        big, rich, left_on="o_custkey", right_on="c_custkey",
        join_type="full outer",
    )
    return joined.select_columns(["o_custkey", "o_totalprice", "c_mktsegment"])


Q_FULL_OUTER_JOIN_SQL = """
SELECT COALESCE(o.o_custkey, c.c_custkey) AS o_custkey, o.o_totalprice, c.c_mktsegment
FROM (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000.0) o
FULL OUTER JOIN (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000.0) c
ON o.o_custkey = c.c_custkey
"""


def q_cube(sf_dir: str):
    """CUBE (flag, status): all four grouping sets. Like q_rollup, one
    streaming pass produces the finest level; the per-flag, per-status
    and grand-total sets re-aggregate the group-cardinality-sized fine
    result driver-side — never a second pass over rows. NULL marks each
    rolled-up dimension, as in SQL CUBE."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    fine = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty"))
        .to_pandas()
    )
    per_flag = fine.groupby("l_returnflag", as_index=False)[["n", "sum_qty"]].sum()
    per_flag["l_linestatus"] = None
    per_status = fine.groupby("l_linestatus", as_index=False)[["n", "sum_qty"]].sum()
    per_status["l_returnflag"] = None
    total = pd.DataFrame({
        "l_returnflag": [None], "l_linestatus": [None],
        "n": [fine["n"].sum()], "sum_qty": [fine["sum_qty"].sum()],
    })
    out = pd.concat([fine, per_flag, per_status, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "n", "sum_qty"]
    ]
    out["sum_qty"] = out["sum_qty"].round(6)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 6) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def t_fill_forward(sf_dir: str):
    """Per-entity forward fill (LOCF): the last observed click value is
    carried to every later event of the same user; leading rows before
    the first click stay NULL (stages/temporal.py:fill_forward — one
    entity-hash shuffle, vectorized running-maximum source index inside
    the bucket). The gap-fill primitive for feature freshness."""
    from ..stages.temporal import fill_forward

    ds = _read(
        sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
        split=True,
    )

    def sparse(batch: pa.Table) -> pa.Table:
        v = pc.if_else(
            pc.equal(batch["event_type"], pa.scalar("click")),
            batch["value"],
            pa.nulls(len(batch), type=batch.schema.field("value").type),
        )
        return pa.table({
            "event_id": batch["event_id"], "ts": batch["ts"],
            "user_id": batch["user_id"], "v": v,
        })

    out = fill_forward(
        ds.map_batches(sparse, batch_format="pyarrow"),
        key="user_id", ts="ts", cols=["v"], tiebreak=["event_id"],
    )
    return out.select_columns(["event_id", "v_ffill"])


T_FILL_FORWARD_SQL = """
SELECT event_id,
       last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
FROM (SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN value END AS v
      FROM events)
"""


def d_mad_filter(sf_dir: str):
    """Robust per-group outlier cut: keep documents whose length is
    within 3 median-absolute-deviations of their source's median. Two
    mergeable grouped-median sketch passes (stages/sketch.py) — only
    O(batches x sources x k) summary bytes leave each — then the tiny
    (median, MAD) maps broadcast into one streaming filter pass. The
    length-outlier curation cut, skew-immune where a mean/std cut is
    not."""
    import ray

    from ..stages.sketch import grouped_median

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    med = grouped_median(ds, key_cols=["source"], value_col="n_chars", out_col="med")
    med_map = dict(zip(med["source"], med["med"]))
    med_ref = ray.put(med_map)

    def dev(batch: pa.Table) -> pa.Table:
        m = (
            pd.Series(batch["source"].to_numpy(zero_copy_only=False))
            .map(ray.get(med_ref))
            .to_numpy(np.float64)
        )
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"source": batch["source"], "dv": pa.array(np.abs(x - m))})

    mad = grouped_median(
        ds.map_batches(dev, batch_format="pyarrow"),
        key_cols=["source"], value_col="dv", out_col="mad",
    )
    mad_map = dict(zip(mad["source"], mad["mad"]))
    # ship the two lookup maps prebuilt — rebuilding them per batch
    # would repeat O(n_sources) Python work across the whole scan
    radius_ref = ray.put({s: 3.0 * mad_map[s] for s in med_map})

    def keep(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        m = src.map(ray.get(med_ref)).to_numpy(np.float64)
        r = src.map(ray.get(radius_ref)).to_numpy(np.float64)
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.filter(pa.array(np.abs(x - m) <= r))

    return ds.map_batches(keep, batch_format="pyarrow")


D_MAD_FILTER_SQL = """
WITH med AS (SELECT source, median(n_chars) AS m FROM documents GROUP BY source),
dev AS (SELECT d.doc_id, d.source, d.n_chars, abs(d.n_chars - med.m) AS dv, med.m AS m
        FROM documents d JOIN med USING (source)),
mad AS (SELECT source, median(dv) AS s FROM dev GROUP BY source)
SELECT dev.doc_id, dev.source, dev.n_chars
FROM dev JOIN mad USING (source)
WHERE abs(dev.n_chars - dev.m) <= 3 * mad.s
"""


def q_string_agg(sf_dir: str):
    """Ordered per-group string aggregation (the shard-concat /
    training-doc-assembly shape): language codes of each source joined
    in doc_id order. One entity-hash-bucket shuffle via grouped_map;
    inside a bucket, a C-level pandas sort + groupby-join handles every
    source of the bucket at once."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "lang"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        out = g.groupby("source", sort=False)["lang"].agg(",".join).reset_index()
        return out.rename(columns={"lang": "langs"})

    return grouped_map(ds, "source", agg)


Q_STRING_AGG_SQL = """
SELECT source, string_agg(lang, ',' ORDER BY doc_id) AS langs
FROM documents
GROUP BY source
"""


def d_token_budget(sf_dir: str):
    """Per-source token-budget cut — the data-mixing primitive (DoReMi /
    Pile recipes cap each source's contribution at a fixed token
    budget): documents are taken in deterministic doc_id order and kept
    while the source's running total stays within budget. One
    entity-hash shuffle (grouped_map); inside a bucket the running
    total is a single C-level groupby-cumsum over every source of the
    bucket. Complements d_mixture_sample (rate-based) with an absolute
    cap."""
    from ..stages.temporal import grouped_map

    BUDGET = 5000  # chars stand in for tokens in the test tables

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "doc_id"], kind="stable")
        cum = g.groupby("source", sort=False)["n_chars"].cumsum()
        return g[cum <= BUDGET]

    return grouped_map(ds, "source", cut)


D_TOKEN_BUDGET_SQL = """
SELECT doc_id, source, n_chars FROM (
    SELECT doc_id, source, n_chars,
           SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM documents)
WHERE cum <= 5000
"""


def d_embed_decontaminate(sf_dir: str):
    """Embedding-space benchmark decontamination — the SEMANTIC
    complement of the n-gram overlap check (d_decontaminate): flag any
    corpus vector whose cosine similarity to ANY benchmark vector
    crosses the threshold (paraphrased eval leakage that shingle
    hashing misses). The benchmark matrix (here: vec_id < 10) is tiny
    and broadcasts once via ray.put; each batch does one float64
    matmul against it (zero-copy embedding extraction) — the corpus
    streams, nothing materializes."""
    import ray

    from ..stages.arrowutil import list_column_matrix

    THRESH = 0.85
    bench_df = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 10")
        .to_pandas()
    )
    B = np.stack(bench_df["embedding"].to_numpy()).astype(np.float64)
    B_ref = ray.put(B / np.linalg.norm(B, axis=1, keepdims=True))

    corpus = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).filter(
        expr="vec_id >= 10"
    )

    def score(batch: pa.Table) -> pa.Table:
        Bn = ray.get(B_ref)
        X = list_column_matrix(batch["embedding"], dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        mc = (Xn @ Bn.T).max(axis=1)
        return pa.table({
            "vec_id": batch["vec_id"],
            "max_cos": pa.array(np.round(mc, 6)),
            "is_contaminated": pa.array(mc > THRESH),
        })

    return corpus.map_batches(score, batch_format="pyarrow")


D_EMBED_DECONTAMINATE_SQL = """
WITH bench AS (
    SELECT CAST(embedding AS DOUBLE[]) AS bemb FROM embeddings WHERE vec_id < 10),
scored AS (
    SELECT e.vec_id,
           max(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), b.bemb)) AS mc
    FROM embeddings e CROSS JOIN bench b
    WHERE e.vec_id >= 10
    GROUP BY e.vec_id)
SELECT vec_id, round(mc, 6) AS max_cos, mc > 0.85 AS is_contaminated
FROM scored
"""


def d_span_mask(sf_dir: str):
    """Deterministic span-corruption planning stats (the T5/BERT
    masked-span layout): every token position is masked by a seeded
    hash rule (~20%), and the per-document report counts tokens, masked
    positions and contiguous masked SPANS (islands). Fully vectorized:
    token counts come from a C-level space count (never materializing
    tokens), positions explode through one np.repeat, and island starts
    are a shifted-compare — no per-row Python, no shuffle (doc-local).
    The same hash rule is replayed by the SQL oracle, so mask placement
    is verified cross-engine, not just the counts."""
    K, K2, M32 = 2654435761, 40503, 1 << 32

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        txt = pd.Series(batch["text"].to_numpy(zero_copy_only=False))
        n = (txt.str.count(" ") + 1).to_numpy(np.int64)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # explode (doc, idx) pairs flat; hash rule mirrors the oracle
        doc_rep = np.repeat(did, n)
        idx = np.arange(int(n.sum()), dtype=np.uint64) - np.repeat(
            np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.uint64), n
        )
        masked = ((doc_rep * np.uint64(K) + idx * np.uint64(K2)) % np.uint64(M32)) % np.uint64(5) == 0
        # island starts: masked and (first of doc or previous unmasked)
        prev = np.empty_like(masked)
        prev[0] = False
        prev[1:] = masked[:-1]
        first = idx == 0
        starts = masked & (first | ~prev)
        seg = np.repeat(np.arange(len(n)), n)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n),
            "n_masked": pa.array(np.bincount(seg, weights=masked, minlength=len(n)).astype(np.int64)),
            "n_spans": pa.array(np.bincount(seg, weights=starts, minlength=len(n)).astype(np.int64)),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


D_SPAN_MASK_SQL = """
WITH toks AS (
    SELECT doc_id, CAST(t.idx AS BIGINT) AS idx
    FROM documents,
         UNNEST(range(0, len(string_split(text, ' ')))) AS t(idx)),
m AS (
    SELECT doc_id, idx,
           ((doc_id * 2654435761 + idx * 40503) % 4294967296) % 5 = 0 AS masked
    FROM toks),
island AS (
    SELECT doc_id, masked,
           CASE WHEN masked AND NOT coalesce(
                LAG(masked) OVER (PARTITION BY doc_id ORDER BY idx), FALSE)
                THEN 1 ELSE 0 END AS start
    FROM m)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(sum(start) AS BIGINT) AS n_spans
FROM island
GROUP BY doc_id
"""


def q_skew_report(sf_dir: str):
    """Key-skew diagnostic — the report you run BEFORE choosing a join
    or salting strategy at 100 TB: per-key group-size distribution
    (key count, max, p50/p99) for a prospective shuffle key. The
    per-key counts come from the partial-combining hash aggregate
    (key-cardinality-sized, never raw rows); their distribution is then
    summarized by ONE mergeable quantile-sketch pass — every statistic
    (n_keys = total sketch weight, max = last sketch value, p50/p99 =
    rank lookups) reads the same merged sketch, so the count stream
    executes exactly once and the report streams even when the key
    space itself is huge."""
    from ..stages.fit import _merge_quant
    from ..stages.sketch import _grouped_quant_parts

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    counts = ds.groupby("l_orderkey").count()

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "g": pa.array(np.zeros(len(batch), dtype=np.int32)),
            "c": batch["count()"].cast(pa.float64()),
        })

    c_ds = counts.map_batches(tag, batch_format="pyarrow")
    merged = _grouped_quant_parts(c_ds, ["g"], "c")
    vals, w = _merge_quant(merged[0])  # the single constant group
    cw = np.cumsum(w)
    total = cw[-1]

    def disc(q: float) -> int:
        return int(vals[np.searchsorted(cw, max(np.ceil(q * total), 1.0), side="left")])

    return pd.DataFrame({
        "n_keys": [int(total)],
        "max_c": [int(vals[-1])],  # rank-uniform compression keeps the max
        "p50_c": [disc(0.5)],
        "p99_c": [disc(0.99)],
    })


Q_SKEW_REPORT_SQL = """
WITH c AS (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey)
SELECT count(*) AS n_keys, max(c) AS max_c,
       CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_c,
       CAST(quantile_disc(c, 0.99) AS BIGINT) AS p99_c
FROM c
"""


def q_grouped_p90_cont(sf_dir: str):
    """Per-group INTERPOLATED 90th percentile (SQL percentile_cont /
    quantile_cont semantics — linear between the two straddling order
    statistics) via the same mergeable weighted-value sketch as the
    discrete variant; completes the quantile-semantics family.
    l_extendedprice is high-cardinality: exact while per-(batch, group)
    distinct counts stay under the 4k sketch cap (true at the sf0.01
    gate), bounded rank error ~n_batch/4096 beyond."""
    from ..stages.sketch import grouped_quantile

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    out = grouped_quantile(
        ds, key_cols=["l_returnflag"], value_col="l_extendedprice",
        q=0.9, out_col="p90_price", interpolate=True,
    )
    out["p90_price"] = out["p90_price"].round(6)
    return out


Q_GROUPED_P90_CONT_SQL = """
SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
FROM lineitem
GROUP BY l_returnflag
"""


def q_three_way_join(sf_dir: str):
    """TPC-H-Q3-shaped three-way pipeline: revenue per market segment
    and order priority. Join strategy chosen per edge the way a 100 TB
    plan would: customer (small dim) broadcasts into orders via the
    sorted-array searchsorted probe; the resulting fact stream then
    shuffle-hash-joins lineitem (fact x fact); one partially-combined
    hash aggregate finishes."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.partition import shuffle_hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    order_keys = np.sort(cust["c_custkey"].to_numpy())
    # dictionary-encode the small side: int codes broadcast zero-copy
    seg_codes, seg_labels = pd.factorize(
        cust.sort_values("c_custkey")["c_mktsegment"].to_numpy()
    )
    keys_ref = ray.put(order_keys)
    codes_ref = ray.put(seg_codes.astype(np.int32))
    labels = list(seg_labels)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderpriority"])

    def attach_segment(batch: pa.Table) -> pa.Table:
        keys, codes = ray.get(keys_ref), ray.get(codes_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
        # inner-join semantics: orders whose custkey has no customer row
        # are DROPPED, not snapped to the adjacent customer
        hit = keys[idx] == ck
        batch = batch.filter(pa.array(hit))
        seg = pa.DictionaryArray.from_arrays(
            pa.array(codes[idx[hit]]), pa.array(labels, type=pa.string())
        )
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_orderpriority": batch["o_orderpriority"],
            "c_mktsegment": seg.cast(pa.string()),
        })

    fact = orders.map_batches(attach_segment, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    joined = shuffle_hash_join(li, fact, left_on="l_orderkey", right_on="o_orderkey")

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "o_orderpriority": batch["o_orderpriority"],
            "__r": r,
        })

    out = (
        joined.map_batches(rev, batch_format="pyarrow")
        .groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(Sum("__r", alias_name="revenue"))
    )
    return _round_cols(out, {"revenue": 2})


Q_THREE_WAY_JOIN_SQL = """
SELECT c_mktsegment, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderpriority
"""


# ---------------------------------------------------------------------------
# data-mixing / domain-selection diagnostics (DoReMi / XLM-R / DSIR shapes)


def d_kl_mix(sf_dir: str):
    """Per-source token-distribution KL divergence vs the corpus-wide
    distribution — the domain-drift diagnostic data-mixing weights are
    derived from. Vocabulary-sized cell aggregate; token rows never
    shuffle (stages/text.py:source_token_divergence)."""
    from ..stages.text import source_token_divergence

    ds = _read(sf_dir, "documents", columns=["text", "source"])
    return source_token_divergence(ds)


D_KL_MIX_SQL = """
WITH w AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
),
c AS (SELECT source, t, CAST(count(*) AS DOUBLE) AS n FROM w GROUP BY source, t),
gt AS (SELECT source, sum(n) AS gn FROM c GROUP BY source),
tt AS (SELECT t, sum(n) AS tn FROM c GROUP BY t),
a AS (SELECT sum(n) AS total FROM c)
SELECT c.source,
       CAST(gt.gn AS BIGINT) AS n_tok,
       round(sum((c.n / gt.gn) * ln((c.n / gt.gn) / (tt.tn / a.total))), 9) AS kl
FROM c JOIN gt USING (source) JOIN tt USING (t) CROSS JOIN a
GROUP BY c.source, gt.gn
ORDER BY c.source
"""


def d_temperature_mix(sf_dir: str):
    """Temperature-scaled source sampling weights w_s ∝ n_s^0.5 (the
    mBERT/XLM-R/Pile upsampling rule for small sources). One per-group
    token-count pass; weights are driver arithmetic on the group-sized
    table."""
    from ..stages.text import temperature_mix_weights

    ds = _read(sf_dir, "documents", columns=["text", "source"])
    return temperature_mix_weights(ds, alpha=0.5)


D_TEMPERATURE_MIX_SQL = """
WITH c AS (
  SELECT source,
         CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS DOUBLE) AS n
  FROM documents GROUP BY source
),
z AS (SELECT sum(pow(n, 0.5)) AS z FROM c)
SELECT source, CAST(n AS BIGINT) AS n_tok, round(pow(n, 0.5) / z.z, 9) AS weight
FROM c CROSS JOIN z ORDER BY source
"""


_TAG_TAXONOMY = [
    ("joins", ["join", "merge"]),
    ("windows", ["window", "stream"]),
    ("storage", ["table", "scan"]),
]


def d_keyword_tag(sf_dir: str):
    """Keyword-taxonomy topic tagging (the cheap router used to label
    web corpora before a trained classifier exists): ordered topic
    list, first-match-wins on vectorized substring hits, counts per
    (source, topic). Only (group, topic) cells shuffle."""
    from ..stages.text import keyword_tag_counts

    ds = _read(sf_dir, "documents", columns=["text", "source"])
    return keyword_tag_counts(ds, _TAG_TAXONOMY)


D_KEYWORD_TAG_SQL = """
SELECT source,
       CASE
         WHEN text LIKE '%join%' OR text LIKE '%merge%' THEN 'joins'
         WHEN text LIKE '%window%' OR text LIKE '%stream%' THEN 'windows'
         WHEN text LIKE '%table%' OR text LIKE '%scan%' THEN 'storage'
         ELSE 'none'
       END AS topic,
       count(*) AS n
FROM documents
GROUP BY source, topic
ORDER BY source, topic
"""


def d_dsir(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): hashed-unigram
    log-ratio of the English-language target domain vs the raw corpus,
    scored per document in one vectorized pass. Runs with the
    REPLAYABLE Horner bucketing, so the SQL oracle re-derives the
    smoothed log-ratio table and every document weight; pytest
    additionally plants vocabulary-disjoint domains and asserts
    target-like docs outrank the rest."""
    from ..stages.text import dsir_weights

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return dsir_weights(
        ds, target_col="lang", target_value="en", replayable=True
    ).sort("doc_id")


D_DSIR_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents),
dt AS (SELECT DISTINCT t FROM w),
pw(k, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (v * 1000003) % 2305843009213693951 FROM pw
  WHERE k < (SELECT COALESCE(max(length(t)), 0) FROM dt)),
ch AS (
  SELECT t, length(t) AS L,
         unnest(regexp_extract_all(t, '.')) AS cc,
         generate_subscripts(regexp_extract_all(t, '.'), 1) AS j
  FROM dt),
h AS (
  SELECT t, CAST(SUM(CAST(ord(cc) AS HUGEINT) * pw.v)
                 % 2305843009213693951 AS BIGINT) % 4096 AS bucket
  FROM ch JOIN pw ON pw.k = L - j GROUP BY t),
tok AS (
  SELECT w.doc_id, h.bucket, (d.lang = 'en') AS is_tgt
  FROM w JOIN h USING (t) JOIN documents d USING (doc_id)),
c AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS DOUBLE) AS tgt,
         CAST(count(*) AS DOUBLE) AS raw
  FROM tok GROUP BY bucket),
tot AS (SELECT sum(tgt) AS T, sum(raw) AS R FROM c),
lr AS (
  SELECT bucket,
         ln(((tgt + 0.5) / ((SELECT T FROM tot) + 0.5 * 4096))
            / ((raw + 0.5) / ((SELECT R FROM tot) + 0.5 * 4096))) AS logratio
  FROM c),
per AS (
  SELECT tok.doc_id, count(*) AS n_tok, sum(lr.logratio) AS logw
  FROM tok JOIN lr USING (bucket) GROUP BY tok.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.n_tok, 0) AS BIGINT) AS n_tok,
       floor(COALESCE(per.logw, 0) * 1000000 + 0.5005) / 1000000 AS logw
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def fe_boxcox(sf_dir: str):
    """Box-Cox power transform with the lambda grid fit as a mergeable
    streaming aggregate (per-lambda sum/sumsq + sum-of-logs partials;
    the SQL oracle replays the whole grid search with the identical
    grid arithmetic and tie-break)."""
    from ..functions.expr import box_cox

    def build(f):
        return [box_cox(f["l_quantity"])]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_quantity"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"boxcox(l_quantity)": "boxcox_qty"},
        rounding={"boxcox_qty": 6},
    )


FE_BOXCOX_SQL = """
WITH g AS (SELECT (i - 10) / 5.0 AS lam FROM range(21) t(i)),
x AS (SELECT l_quantity AS v FROM lineitem),
st AS (
  SELECT lam, count(*) AS n, sum(ln(v)) AS slog,
         sum(CASE WHEN lam = 0 THEN ln(v) ELSE (pow(v, lam) - 1) / lam END) AS s,
         sum(pow(CASE WHEN lam = 0 THEN ln(v) ELSE (pow(v, lam) - 1) / lam END, 2)) AS ss
  FROM x CROSS JOIN g GROUP BY lam),
ll AS (
  SELECT lam, -n / 2.0 * ln(ss / n - (s / n) * (s / n)) + (lam - 1) * slog AS ll
  FROM st),
best AS (SELECT lam FROM ll ORDER BY ll DESC, lam LIMIT 1)
SELECT l_orderkey, l_linenumber,
       round(CASE WHEN best.lam = 0 THEN ln(l_quantity)
                  ELSE (pow(l_quantity, best.lam) - 1) / best.lam END, 6) AS boxcox_qty
FROM lineitem CROSS JOIN best
"""


def fe_yeojohnson(sf_dir: str):
    """Yeo-Johnson power transform composed over a z-scored (negative-
    valued) input — both fits mergeable streaming aggregates; the SQL
    oracle replays the zscore AND the full lambda grid search."""
    from ..functions.expr import yeo_johnson, unary

    def build(f):
        return [yeo_johnson(unary("zscore", f["l_quantity"]))]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_quantity"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={"yeojohnson(zscore(l_quantity))": "yj_qty"},
        rounding={"yj_qty": 6},
    )


FE_YEOJOHNSON_SQL = """
WITH p AS (SELECT avg(l_quantity) AS m, stddev_pop(l_quantity) AS sd FROM lineitem),
x AS (SELECT l_orderkey, l_linenumber, (l_quantity - m) / sd AS v
      FROM lineitem CROSS JOIN p),
g AS (SELECT (i - 10) / 5.0 AS lam FROM range(21) t(i)),
yj AS (
  SELECT lam,
         CASE WHEN v >= 0 THEN
                CASE WHEN lam = 0 THEN ln(v + 1) ELSE (pow(v + 1, lam) - 1) / lam END
              ELSE
                CASE WHEN lam = 2 THEN -ln(1 - v) ELSE -(pow(1 - v, 2 - lam) - 1) / (2 - lam) END
         END AS y
  FROM x CROSS JOIN g),
st AS (SELECT lam, count(*) AS n, sum(y) AS s, sum(y * y) AS ss FROM yj GROUP BY lam),
c AS (SELECT sum(CASE WHEN v >= 0 THEN ln(v + 1) ELSE -ln(1 - v) END) AS slog FROM x),
ll AS (SELECT lam, -n / 2.0 * ln(ss / n - (s / n) * (s / n)) + (lam - 1) * slog AS ll
       FROM st CROSS JOIN c),
best AS (SELECT lam FROM ll ORDER BY ll DESC, lam LIMIT 1)
SELECT l_orderkey, l_linenumber,
       round(CASE WHEN v >= 0 THEN
                    CASE WHEN best.lam = 0 THEN ln(v + 1)
                         ELSE (pow(v + 1, best.lam) - 1) / best.lam END
                  ELSE
                    CASE WHEN best.lam = 2 THEN -ln(1 - v)
                         ELSE -(pow(1 - v, 2 - best.lam) - 1) / (2 - best.lam) END
             END, 6) AS yj_qty
FROM x CROSS JOIN best
"""


def _set_op_sides(sf_dir: str):
    """Shared projections for the INTERSECT / EXCEPT queries: urgent
    order keys vs heavy-lineitem order keys, both renamed to `k`."""
    urgent = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"],
        where=pc.field("o_orderpriority") == "1-URGENT",
    ).map_batches(
        lambda b: pa.table({"k": b["o_orderkey"]}), batch_format="pyarrow"
    )
    heavy = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"],
        where=pc.field("l_quantity") >= 45.0,
    ).map_batches(
        lambda b: pa.table({"k": b["l_orderkey"]}), batch_format="pyarrow"
    )
    # both sides are .filter() lineages (no metadata count); size the
    # buckets from the unfiltered reads, an upper bound
    from ..stages.bucketing import default_buckets

    B = max(
        default_buckets(_read(sf_dir, "orders", columns=["o_orderkey"], split=False)),
        default_buckets(_read(sf_dir, "lineitem", columns=["l_orderkey"], split=False)),
    )
    return urgent, heavy, B


def q_intersect(sf_dir: str):
    """Set op: urgent order keys INTERSECT heavy-lineitem order keys
    (distinct semantics; key-hash co-location + per-bucket merge)."""
    from ..stages.partition import distinct_set_op

    urgent, heavy, B = _set_op_sides(sf_dir)
    return distinct_set_op(urgent, heavy, on=["k"], op="intersect", num_buckets=B).sort("k")


Q_INTERSECT_SQL = """
SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT l_orderkey FROM lineitem WHERE l_quantity >= 45
ORDER BY k
"""


def q_except(sf_dir: str):
    """Set op: urgent order keys EXCEPT heavy-lineitem order keys."""
    from ..stages.partition import distinct_set_op

    urgent, heavy, B = _set_op_sides(sf_dir)
    return distinct_set_op(urgent, heavy, on=["k"], op="except", num_buckets=B).sort("k")


Q_EXCEPT_SQL = """
SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT l_orderkey FROM lineitem WHERE l_quantity >= 45
ORDER BY k
"""


def tok_bigram_counts(sf_dir: str):
    """Exact top-50 adjacent token-pair frequencies over the generated
    token table — the counting step of one BPE merge. Pair encode +
    np.unique partials per batch, one distinct-pair aggregate, local
    top-k prefilter, deterministic (n desc, a, b) ties."""
    from ..sources.token_table import token_table_dataset
    from ..stages.token_stats import bigram_pair_counts

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    if n <= 30000:
        ensure_tok_oracle_fixtures(ns=(n,))
    return bigram_pair_counts(token_table_dataset(n), k=50)


def tok_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich et al. 2016) —
    the full merge LOOP, not just one pair count: 6 merges, each a
    streaming pair-count pass + a vectorized corpus rewrite, lineage
    bounded by periodic parquet checkpoints (stages/bpe.py). Returns
    the learned merge table plus the corpus compression it achieves
    (total tokens before/after applying all merges in ONE pass).
    Deterministic; pytest verifies exact agreement with a pure-Python
    greedy recount reference including self-pair overlap runs."""
    from ..sources.token_table import token_table_dataset
    from ..stages.bpe import apply_merges, bpe_train

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )

    # byte-level view (token id mod 256): BPE over the raw ~50k-id
    # table is degenerate (uniform ids -> max pair count 2); byte-level
    # BPE's 256 base symbols is the standard GPT-2 starting alphabet
    # and gives the merge loop real mass to find.
    def byte_view(batch: pa.Table) -> pa.Table:
        arr = batch["tokens"]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        flat = pc.bit_wise_and(arr.values.cast(pa.int64()), 255)
        lst = pa.ListArray.from_arrays(arr.offsets, flat)
        return batch.set_column(
            batch.schema.get_field_index("tokens"), "tokens", lst
        )

    def corpus():
        return token_table_dataset(n).map_batches(byte_view, batch_format="pyarrow")

    merges = bpe_train(corpus(), n_merges=6)

    def tok_count(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([int(pc.sum(pc.list_value_length(batch["tokens"])).as_py())])}
        )

    before = corpus().map_batches(tok_count, batch_format="pyarrow").sum("n")
    after = (
        apply_merges(corpus(), merges)
        .map_batches(tok_count, batch_format="pyarrow")
        .sum("n")
    )
    merges["tokens_before"] = np.int64(before)
    merges["tokens_after"] = np.int64(after)
    return merges


def tok_pmi(sf_dir: str):
    """Skip-gram co-occurrence + PMI over the byte-level token view
    (window 2, forward contexts) — the word2vec/PPMI context-table
    statistic. The pair table is alphabet-bounded (256² cells) so only
    the distinct cells shuffle; the oracle rebuilds pairs, marginals
    and ln-PMI in SQL over the tokens-included fixture."""
    from ..sources.token_table import token_table_dataset
    from ..stages.token_stats import skipgram_pmi

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    if n <= 30000:
        ensure_tok_oracle_fixtures(ns=(n,))
    return skipgram_pmi(token_table_dataset(n), window=2, mod=256, k=25)


def tok_entropy(sf_dir: str):
    """Per-document unigram entropy (token-diversity quality signal)
    — stateless vectorized map_batches, one output row per doc; the
    oracle recomputes -Σ p·ln(p) per doc_id in SQL."""
    from ..sources.token_table import token_table_dataset
    from ..stages.token_stats import token_entropy_batch

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    if n <= 30000:
        ensure_tok_oracle_fixtures(ns=(n,))
    return token_table_dataset(n).map_batches(
        token_entropy_batch, batch_format="pyarrow"
    ).sort("doc_id")


def tok_seq_dedup(sf_dir: str):
    """Exact token-SEQUENCE dedup over the token table — the north
    rule's per-row token-array-equality invariant as an operator: one
    row (min doc_id) per distinct token array plus the group size
    (stages/dedup.py:sequence_dedup; rows encode to flat bytes, no
    per-row Python). Random sequences never collide, so a deterministic
    slice (numeric doc id % 20 == 3) is rewritten to the 4-token
    template [k%5, 7, 11, 13] — 5 cross-doc duplicate groups both
    engines replay."""
    from ..sources.token_table import token_table_dataset
    from ..stages.dedup import sequence_dedup

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    if n <= 30000:
        ensure_tok_oracle_fixtures(ns=(n,))

    def inject(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        k = (
            pd.Series(batch["doc_id"].to_pandas()).str.slice(4).astype(np.int64).to_numpy()
        )
        hit = k % 20 == 3
        arr = batch["tokens"]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        lengths = _pc.list_value_length(arr).to_numpy().astype(np.int64)
        values = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        new_len = np.where(hit, 4, lengths)
        out_off = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(new_len, out=out_off[1:])
        out = np.empty(int(out_off[-1]), dtype=np.int32)
        # non-hit rows copy through at their new offsets (one scatter)
        row_of = np.repeat(np.arange(len(lengths)), lengths)
        within = np.arange(len(values), dtype=np.int64) - np.repeat(starts, lengths)
        keep = np.repeat(~hit, lengths)
        out[(out_off[:-1][row_of] + within)[keep]] = values[keep]
        # hit rows get the 4-token template
        if hit.any():
            kh = k[hit]
            quad = np.stack(
                [
                    (kh % 5).astype(np.int32),
                    np.full(len(kh), 7, np.int32),
                    np.full(len(kh), 11, np.int32),
                    np.full(len(kh), 13, np.int32),
                ],
                axis=1,
            )
            out[out_off[:-1][hit][:, None] + np.arange(4)] = quad
        toks = pa.ListArray.from_arrays(
            pa.array(out_off, type=pa.int64()).cast(pa.int32()), pa.array(out)
        )
        return pa.table({"doc_id": batch["doc_id"], "tokens": toks})

    ds = token_table_dataset(n).map_batches(inject, batch_format="pyarrow")
    return sequence_dedup(ds).sort("doc_id")


TOK_SEQ_DEDUP_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN CAST(substr(doc_id, 5) AS BIGINT) % 20 = 3
              THEN [CAST(CAST(substr(doc_id, 5) AS BIGINT) % 5 AS INTEGER),
                    7, 11, 13]
              ELSE tokens END AS seq
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_full_30000_seed42.parquet')
)
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS group_size
FROM d GROUP BY seq ORDER BY doc_id
"""


def tok_grep(sf_dir: str):
    """Token-subsequence search (the memorization-probe primitive):
    every (doc, position) where the byte-view token pair (7, 11) occurs
    contiguously. One shifted vectorized compare per needle offset over
    the zero-copy flat buffer — row-local, nothing shuffles
    (stages/token_stats.py:token_grep); the oracle re-finds the
    positions with a position self-join."""
    from ..sources.token_table import token_table_dataset
    from ..stages.token_stats import token_grep

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    if n <= 30000:
        ensure_tok_oracle_fixtures(ns=(n,))
    out = token_grep(token_table_dataset(n), [7, 11], mod=256)
    return out.sort(["doc_id", "pos"])


TOK_GREP_SQL = f"""
WITH t AS (
  SELECT doc_id, tokens
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_full_30000_seed42.parquet')
),
u AS (
  SELECT doc_id, unnest(tokens) % 256 AS tok,
         generate_subscripts(tokens, 1) AS i
  FROM t
)
SELECT a.doc_id AS doc_id, CAST(a.i - 1 AS BIGINT) AS pos
FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1
WHERE a.tok = 7 AND b.tok = 11
ORDER BY doc_id, pos
"""


TOK_ENTROPY_SQL = f"""
WITH t AS (
  SELECT doc_id, tokens
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_full_30000_seed42.parquet')
),
u AS (SELECT doc_id, unnest(tokens) AS tok FROM t),
c AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY doc_id, tok),
l AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS L FROM c GROUP BY doc_id)
SELECT c.doc_id AS doc_id, CAST(l.L AS INT) AS n_tok,
       round(-sum((c.c / l.L) * ln(c.c / l.L)), 6) AS entropy
FROM c JOIN l USING (doc_id)
GROUP BY c.doc_id, l.L
ORDER BY doc_id
"""


def tok_zipf(sf_dir: str):
    """Zipf-exponent fit over the corpus unigram distribution (top
    1000 ranks): the vocabulary-design diagnostic for tokenizer
    planning. Exchange is the vocab-bounded (token, count) table; the
    oracle replays rank assignment and the ln-ln OLS with regr_*."""
    from ..sources.token_table import token_table_dataset
    from ..stages.token_stats import zipf_fit

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    if n <= 30000:
        ensure_tok_oracle_fixtures(ns=(n,))
    return zipf_fit(token_table_dataset(n), top_ranks=1000)


TOK_ZIPF_SQL = f"""
WITH t AS (
  SELECT tokens
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_full_30000_seed42.parquet')
),
u AS (SELECT unnest(tokens) AS tok FROM t),
c AS (SELECT tok, count(*) AS n FROM u GROUP BY tok),
r AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, tok) AS DOUBLE)) AS lx,
         ln(CAST(n AS DOUBLE)) AS ly
  FROM c
  ORDER BY n DESC, tok
  LIMIT 1000
)
SELECT round(regr_slope(ly, lx), 6) AS slope,
       round(regr_intercept(ly, lx), 6) AS intercept,
       round(regr_r2(ly, lx), 6) AS r2,
       count(*) AS n_ranks
FROM r
"""


TOK_PMI_SQL = f"""
WITH t AS (
  SELECT row_number() OVER () AS rid, tokens
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_full_30000_seed42.parquet')
),
u AS (
  SELECT rid, unnest(tokens) % 256 AS tok, generate_subscripts(tokens, 1) AS i FROM t
),
c AS (
  SELECT x.tok AS a, y.tok AS b, count(*) AS n
  FROM u x JOIN u y ON x.rid = y.rid AND y.i - x.i BETWEEN 1 AND 2
  GROUP BY x.tok, y.tok
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS npairs FROM c),
ml AS (SELECT a, CAST(sum(n) AS DOUBLE) AS ca FROM c GROUP BY a),
mr AS (SELECT b, CAST(sum(n) AS DOUBLE) AS cb FROM c GROUP BY b)
SELECT CAST(c.a AS BIGINT) AS a, CAST(c.b AS BIGINT) AS b, c.n AS n,
       round(ln(CAST(c.n AS DOUBLE) * npairs / (ca * cb)), 6) AS pmi
FROM c, tot
JOIN ml ON ml.a = c.a
JOIN mr ON mr.b = c.b
ORDER BY n DESC, a, b
LIMIT 25
"""


# Oracle pinned at the driver gate size (sf0.01 -> 30,000 rows), same
# convention as TOK_BACKFILL_SQL; reads the tokens-included twin.
TOK_BIGRAM_SQL = f"""
WITH t AS (
  SELECT row_number() OVER () AS rid, tokens
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_full_30000_seed42.parquet')
),
u AS (
  SELECT rid, unnest(tokens) AS tok, generate_subscripts(tokens, 1) AS i FROM t
),
p AS (
  SELECT x.tok AS a, y.tok AS b
  FROM u x JOIN u y ON x.rid = y.rid AND y.i = x.i + 1
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, count(*) AS n
FROM p GROUP BY a, b
ORDER BY n DESC, a, b
LIMIT 50
"""


def t_funnel(sf_dir: str):
    """Ordered funnel conversion over the event stream (product-
    analytics shape: view -> click -> purchase, each step strictly
    after the previous one was first reached). The read pushes an
    event-type filter into the scan so only funnel events enter the
    entity shuffle; per-bucket chained groupby-mins, K count rows per
    bucket to the final aggregate (stages/temporal.py:funnel)."""
    from ..stages.temporal import funnel

    steps = ["view", "click", "purchase"]
    ds = _read(
        sf_dir, "events", columns=["user_id", "ts", "event_type"],
        where=pc.field("event_type").isin(steps),
    )
    return funnel(ds, steps)


T_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, count(*) AS n_users FROM s1
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3
)
ORDER BY step
"""


def t_retention(sf_dir: str):
    """Weekly cohort retention matrix: cohort = each user's first
    active day, n_users = distinct users with any event in week
    `offset` of their own clock. Per-batch distinct (user, day) cells
    bound the exchange to active user-days; users never straddle
    buckets so the per-bucket counts sum exactly
    (stages/temporal.py:retention_cohorts)."""
    from ..stages.temporal import retention_cohorts

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return retention_cohorts(ds, period_days=7)


T_RETENTION_SQL = """
WITH cells AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events
),
firsts AS (SELECT user_id, min(d) AS c FROM cells GROUP BY user_id),
wk AS (
  SELECT DISTINCT cells.user_id, c AS cohort_day, (d - c) // 7 AS "offset"
  FROM cells JOIN firsts ON cells.user_id = firsts.user_id
)
SELECT cohort_day, "offset", count(*) AS n_users
FROM wk GROUP BY cohort_day, "offset"
ORDER BY cohort_day, "offset"
"""


def d_inverted_index(sf_dir: str):
    """Inverted-index build over the document corpus: token -> document
    frequency + comma-joined doc_id posting list in ascending id order
    (stages/text.py:inverted_index — per-batch distinct (token, doc)
    cells, one token-hash shuffle, C-level per-bucket groupby-join)."""
    from ..stages.text import inverted_index

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return inverted_index(ds)


D_INVERTED_INDEX_SQL = """
WITH cells AS (
  SELECT DISTINCT unnest(regexp_extract_all(text, '\\S+')) AS token, doc_id
  FROM documents
)
SELECT token, count(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM cells
GROUP BY token
ORDER BY token
"""


def d_blocked_fuzzy_join(sf_dir: str):
    """Large x large fuzzy join with NO broadcast side (entity
    resolution at corpus scale): a deterministically-dirtied name per
    customer (the (c_custkey % n)-th part name, last char dropped on
    every third key — the established injection pattern, replayed
    identically by the oracle) is matched against the part-name table
    through stages/text.py:blocked_fuzzy_join — exact length blocking,
    right side replicated into the 2k+1 adjacent length blocks, one
    hash shuffle, per-block vectorized Wagner-Fischer DP."""
    from ..stages.text import blocked_fuzzy_join

    names = np.sort(
        _read(sf_dir, "part", columns=["p_name"]).to_pandas()["p_name"].unique()
    ).astype(object)
    n = len(names)

    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def dirty(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy()
        s = pd.Series(names[ck % n], dtype=object)
        typo = ck % 3 == 0
        s[typo] = s[typo].str.slice(0, -1)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "dirty": pa.array(s.to_numpy(dtype=object), type=pa.string()),
            }
        )

    left = cust.map_batches(dirty, batch_format="pyarrow")
    right = _read(sf_dir, "part", columns=["p_name"])
    return blocked_fuzzy_join(
        left, right, left_col="dirty", right_col="p_name",
        left_id="c_custkey", max_dist=1,
    )


D_BLOCKED_FUZZY_JOIN_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part),
cnt AS (SELECT count(*) AS n FROM names),
idx AS (SELECT p_name, row_number() OVER (ORDER BY p_name) - 1 AS i FROM names),
dirty AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0
              THEN substr(idx.p_name, 1, CAST(length(idx.p_name) AS INT) - 1)
              ELSE idx.p_name END AS dirty
  FROM customer
  JOIN cnt ON TRUE
  JOIN idx ON idx.i = c_custkey % cnt.n
),
cand AS (
  SELECT d.c_custkey, d.dirty, n2.p_name,
         levenshtein(d.dirty, n2.p_name) AS dist
  FROM dirty d
  JOIN names n2 ON abs(length(d.dirty) - length(n2.p_name)) <= 1
)
SELECT c_custkey, dirty, best_match, dist FROM (
  SELECT c_custkey, dirty, p_name AS best_match, CAST(dist AS BIGINT) AS dist,
         row_number() OVER (PARTITION BY c_custkey ORDER BY dist, p_name) AS rn
  FROM cand WHERE dist <= 1
) WHERE rn = 1
ORDER BY c_custkey
"""


def t_transitions(sf_dir: str):
    """First-order Markov transition matrix of the event stream
    (journey analysis / next-event model table): counts and
    row-normalized probabilities of event_type -> next event_type per
    user timeline (stages/temporal.py:transition_counts; ties on ts
    break by event_id, exactly as the oracle's window ORDER BY)."""
    from ..stages.temporal import transition_counts

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "event_id"])
    return transition_counts(ds, tiebreak="event_id")


T_TRANSITIONS_SQL = """
WITH nxt AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM c ORDER BY from_type, to_type
"""


def t_gap_stats(sf_dir: str):
    """Per-user inter-event arrival statistics (engagement cadence):
    gap count, exact integer-microsecond min/max, 6dp mean
    (stages/temporal.py:interarrival_stats — users co-locate, only the
    per-user result rows leave the entity shuffle)."""
    from ..stages.temporal import interarrival_stats

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    return interarrival_stats(ds, tiebreak="event_id")


T_GAP_STATS_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, count(gap) AS n_gaps,
       CAST(min(gap) AS BIGINT) AS gap_min_us,
       CAST(max(gap) AS BIGINT) AS gap_max_us,
       round(avg(gap), 6) AS gap_mean_us
FROM g WHERE gap IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def q_snapshot_diff(sf_dir: str):
    """Snapshot delta audit between two versions of the orders table
    (CDC verification shape; versions derived deterministically from
    the fixture and replayed by the oracle: v1 drops keys %89==0, v2
    drops %97==0 and bumps o_totalprice on %13==0). Both versions
    hash-partition into shared buckets — neither side broadcasts
    (stages/partition.py:snapshot_diff)."""
    from ..stages.partition import snapshot_diff

    base = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def v1_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["o_orderkey"].to_numpy() % 89 != 0))

    def v2_mutate(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.array(batch["o_orderkey"].to_numpy() % 97 != 0))
        k = batch["o_orderkey"].to_numpy()
        v = batch["o_totalprice"].to_numpy().copy()
        v[k % 13 == 0] += 1.0
        return pa.table({"o_orderkey": batch["o_orderkey"], "o_totalprice": pa.array(v)})

    v1 = base.map_batches(v1_filter, batch_format="pyarrow")
    v2 = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).map_batches(
        v2_mutate, batch_format="pyarrow"
    )
    return snapshot_diff(v1, v2, key="o_orderkey", val="o_totalprice")


Q_SNAPSHOT_DIFF_SQL = """
WITH v1 AS (
  SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey % 89 <> 0
),
v2 AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS v
  FROM orders WHERE o_orderkey % 97 <> 0
),
j AS (
  SELECT v1.k AS k1, v2.k AS k2, v1.v AS a, v2.v AS b
  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
SELECT CASE WHEN k2 IS NULL THEN 'removed'
            WHEN k1 IS NULL THEN 'added'
            WHEN a <> b THEN 'changed'
            ELSE 'unchanged' END AS status,
       count(*) AS n
FROM j GROUP BY status ORDER BY status
"""


def d_novelty(sf_dir: str):
    """Per-document n-gram novelty vs a reference slice (source =
    'src_0' documents): the fraction of each doc's distinct word-5-grams
    absent from the reference — the redundancy/memorization score dual
    to the decontamination flag. Engine probes broadcast shingle HASHES;
    the oracle compares raw 5-gram STRINGS (equal outcomes absent 64-bit
    collisions, so the oracle also guards the hash path)."""
    from ..stages.dedup import ngram_novelty

    ref = (
        _read(sf_dir, "documents", columns=["source", "text"], split=False)
        .to_pandas()
    )
    ref = ref[ref["source"] == "src_0"]["text"].tolist()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_novelty(ds, ref, ngram_words=5)


D_NOVELTY_SQL = """
WITH w AS (
  SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS ws FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 4, 0)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                     ws[i+3] || ' ' || ws[i+4])) AS gram
  FROM w
),
ref AS (SELECT DISTINCT gram FROM g JOIN w USING (doc_id) WHERE w.source = 'src_0'),
per AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN ref.gram IS NULL THEN 1 ELSE 0 END) AS n_unseen
  FROM g LEFT JOIN ref ON g.gram = ref.gram
  GROUP BY g.doc_id
)
SELECT w.doc_id,
       CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(per.n_unseen, 0) AS BIGINT) AS n_unseen,
       round(CASE WHEN per.n_grams > 0 THEN per.n_unseen * 1.0 / per.n_grams ELSE 0.0 END, 6) AS novelty
FROM w LEFT JOIN per ON w.doc_id = per.doc_id
ORDER BY w.doc_id
"""


def d_vocab_encode(sf_dir: str):
    """Frequency-ranked vocabulary build + token-id encode (the
    tokenizer-apply step): ids assigned by (count desc, token) rank,
    one vocab-sized count aggregate then one broadcast searchsorted
    pass per batch (stages/text.py:build_vocab/vocab_encode). The query
    returns the per-doc checksum columns; the list<int32> ids layout is
    pytest-covered."""
    from ..stages.text import build_vocab, vocab_encode

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    toks, ids = build_vocab(ds, text_col="text")
    return vocab_encode(ds, toks, ids, with_ids=False).select_columns(
        ["doc_id", "n_tok", "ids_sum", "ids_min", "ids_max"]
    )


D_VOCAB_ENCODE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
),
counts AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
vocab AS (SELECT t, row_number() OVER (ORDER BY c DESC, t) - 1 AS id FROM counts),
enc AS (SELECT tok.doc_id, vocab.id FROM tok JOIN vocab ON tok.t = vocab.t),
per AS (
  SELECT doc_id, count(*) AS n_tok, sum(id) AS ids_sum,
         min(id) AS ids_min, max(id) AS ids_max
  FROM enc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(COALESCE(per.ids_sum, 0) AS BIGINT) AS ids_sum,
       CAST(COALESCE(per.ids_min, -1) AS BIGINT) AS ids_min,
       CAST(COALESCE(per.ids_max, -1) AS BIGINT) AS ids_max
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


def d_detokenize(sf_dir: str):
    """Tokenizer round-trip with a TOP-K vocabulary (K=400): encode to
    list<int32> (rare tokens go OOV on purpose), then decode back
    (stages/text.py:vocab_decode — broadcast id->token gather + Arrow
    binary_join, no per-row Python) with '<unk>' standing in for OOV.
    The oracle replays rank-then-substitute-then-string_agg in SQL, so
    the whole encode->decode path is value-verified including the OOV
    branch."""
    from ..stages.text import build_vocab, vocab_decode, vocab_encode

    K = 400
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    toks, ids = build_vocab(ds, text_col="text")
    keep = np.asarray(ids) < K
    toks, ids = np.asarray(toks)[keep], np.asarray(ids)[keep]
    enc = vocab_encode(ds, toks, ids, with_ids=True,
                       with_checksums=False).select_columns(["doc_id", "ids"])
    out = vocab_decode(enc, toks, ids).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


D_DETOKENIZE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
counts AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
vocab AS (SELECT t, row_number() OVER (ORDER BY c DESC, t) - 1 AS id FROM counts),
mapped AS (
  SELECT tok.doc_id, tok.i,
         CASE WHEN v.id < 400 THEN tok.t ELSE '<unk>' END AS t
  FROM tok JOIN vocab v ON tok.t = v.t),
agg AS (
  SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text
  FROM mapped GROUP BY doc_id)
SELECT d.doc_id, COALESCE(agg.text, '') AS text
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
ORDER BY d.doc_id
"""


def d_oov_rate(sf_dir: str):
    """Vocabulary-coverage signal: encode against a TOP-K (K=300)
    vocabulary and report each doc's out-of-vocabulary token count and
    rate — the standard check that a trained tokenizer still covers a
    new corpus shard. Same broadcast searchsorted encode as
    d_vocab_encode; the rate is n_oov / n_tok, identical int/int
    division in both engines."""
    from ..stages.text import build_vocab, vocab_encode

    K = 300
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    toks, ids = build_vocab(ds, text_col="text")
    keep = np.asarray(ids) < K
    out = vocab_encode(ds, np.asarray(toks)[keep], np.asarray(ids)[keep],
                       with_ids=False, with_checksums=False)
    pdf = out.to_pandas()
    # n_oov/n_tok is a dyadic-capable quotient (e.g. 45/128 = exactly
    # 0.3515625): numpy's half-even round and DuckDB's half-away round
    # DISAGREE at such .5e-6 boundaries, so both engines use the biased
    # half-up quantizer (same rationale as T_EWMA_SQL)
    rate = pdf["n_oov"] / np.maximum(pdf["n_tok"], 1)
    pdf["oov_rate"] = np.floor(rate * 1e6 + 0.5005) / 1e6
    return pdf.sort_values("doc_id").reset_index(drop=True)


D_OOV_RATE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents),
counts AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
vocab AS (SELECT t, row_number() OVER (ORDER BY c DESC, t) - 1 AS id FROM counts),
per AS (
  SELECT tok.doc_id, count(*) AS n_tok,
         sum(CASE WHEN v.id >= 300 THEN 1 ELSE 0 END) AS n_oov
  FROM tok JOIN vocab v ON tok.t = v.t GROUP BY tok.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(COALESCE(per.n_oov, 0) AS BIGINT) AS n_oov,
       floor((COALESCE(per.n_oov, 0) / greatest(COALESCE(per.n_tok, 0), 1))
             * 1000000 + 0.5005) / 1000000 AS oov_rate
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


def q_profile(sf_dir: str):
    """Numeric column profiler over the event stream (n, n_null, min,
    max, 6dp mean per column in ONE streaming pass —
    stages/stats.py:profile_columns). NULLs are injected
    deterministically (value -> NULL on event_id % 11 == 0) so the
    null-handling path is exercised; the oracle replays the injection."""
    from ..stages.stats import profile_columns

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def inject(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        v = batch["value"].to_numpy().copy()
        v[eid % 11 == 0] = np.nan
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "value": pa.array(pd.Series(v), from_pandas=True),
            }
        )

    return profile_columns(
        ds.map_batches(inject, batch_format="pyarrow"), ["user_id", "value"]
    )


Q_PROFILE_SQL = """
WITH e AS (
  SELECT user_id,
         CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value
  FROM events
)
SELECT 'user_id' AS col, count(*) AS n,
       count(*) - count(user_id) AS n_null,
       CAST(min(user_id) AS DOUBLE) AS v_min,
       CAST(max(user_id) AS DOUBLE) AS v_max,
       round(avg(user_id), 6) AS v_mean
FROM e
UNION ALL
SELECT 'value', count(*), count(*) - count(value),
       min(value), max(value), round(avg(value), 6)
FROM e
ORDER BY col
"""


def d_covariance(sf_dir: str):
    """Exact population covariance matrix of the 64-dim embedding table
    in ONE streaming pass (per batch: (n, Σx, XᵀX) = O(d²) floats leave
    the stream; no shuffle — stages/stats.py:covariance_matrix_list).
    This is the mergeable pass under d_pca / whitening, here
    value-verified cell-by-cell against SQL covar_pop over the unnested
    dims."""
    from ..stages.stats import covariance_matrix_list

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    return covariance_matrix_list(ds, "embedding")


D_COVARIANCE_SQL = """
WITH u AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT a.dim AS dim_a, b.dim AS dim_b,
       floor(covar_pop(a.v, b.v) * 1000000 + 0.5005) / 1000000 AS cov
FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY 1, 2
"""


def q_spearman(sf_dir: str):
    """Spearman rank correlation (average ranks for ties) between
    l_quantity and l_discount WITHOUT ranking any row: both columns are
    low-cardinality, so per-batch joint value counts (≤ 50×11 cells)
    pre-aggregate inside map_batches, a tiny cell exchange sums them,
    and the driver derives exact tie-averaged ranks from the marginals —
    rank(v) = #smaller + (count(v)+1)/2 — and Pearson over the weighted
    rank pairs. Ranks are centered before the moment sums so nothing
    exceeds float64's exact-integer range at any n."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "q": batch["l_quantity"].to_numpy(),
                "d": batch["l_discount"].to_numpy(),
                "n": 1,
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["q", "d"], as_index=False).sum(), preserve_index=False
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["q", "d"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = int(jc["n"].sum())

    def avg_ranks(vals: np.ndarray, cnts: np.ndarray) -> dict:
        order = np.argsort(vals)
        v, c = vals[order], cnts[order].astype(np.float64)
        before = np.concatenate(([0.0], np.cumsum(c)[:-1]))
        return dict(zip(v, before + (c + 1.0) / 2.0))

    mq = jc.groupby("q", as_index=False)["n"].sum()
    md = jc.groupby("d", as_index=False)["n"].sum()
    r1_map = avg_ranks(mq["q"].to_numpy(), mq["n"].to_numpy())
    r2_map = avg_ranks(md["d"].to_numpy(), md["n"].to_numpy())
    w = jc["n"].to_numpy(np.float64)
    r1 = jc["q"].map(r1_map).to_numpy(np.float64)
    r2 = jc["d"].map(r2_map).to_numpy(np.float64)
    mean = (n + 1) / 2.0  # both rank means, exactly
    r1c, r2c = r1 - mean, r2 - mean
    num = float((w * r1c * r2c).sum())
    den = float(np.sqrt((w * r1c * r1c).sum() * (w * r2c * r2c).sum()))
    rho = num / den if den > 0 else np.nan
    return pd.DataFrame(
        {"spearman": [np.floor(rho * 1e6 + 0.5005) / 1e6], "n": [n]}
    )


Q_SPEARMAN_SQL = """
WITH r AS (
  SELECT RANK() OVER (ORDER BY l_quantity)
           + (COUNT(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS r1,
         RANK() OVER (ORDER BY l_discount)
           + (COUNT(*) OVER (PARTITION BY l_discount) - 1) / 2.0 AS r2
  FROM lineitem
)
SELECT floor(corr(r1, r2) * 1000000 + 0.5005) / 1000000 AS spearman,
       count(*) AS n
FROM r
"""


def fe_chi2(sf_dir: str):
    """Chi-square filter score (sklearn SelectKBest-chi2 / FCBF family,
    reference feature_selection wrappers): contingency of the 10-bin
    equal-width discretized l_extendedprice (same bin rule as
    fe_discretize) × the binary return flag, with per-cell expected
    counts and chi² contributions. Pass 1 is a streaming min/max; pass
    2 pre-aggregates the ≤ 20 cells inside map_batches — only cells
    shuffle. Expected counts are integer-ratio quotients → biased
    half-up 6dp quantizer in BOTH engines, and contributions are
    computed FROM the quantized expected so every float op matches."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice", "l_returnflag"])
    mm = ds.aggregate(Min("l_extendedprice"), Max("l_extendedprice"))
    lo, hi = float(mm["min(l_extendedprice)"]), float(mm["max(l_extendedprice)"])
    width = (hi - lo) / 10.0

    def cells(batch: pa.Table) -> pa.Table:
        x = batch["l_extendedprice"].to_numpy()
        b = np.minimum(np.maximum(np.ceil((x - lo) / width) - 1, 0), 9)
        y = (batch["l_returnflag"].to_numpy(zero_copy_only=False) == "R").astype(
            np.int32
        )
        df = pd.DataFrame({"bin": b.astype(np.int32), "y": y, "observed": 1})
        return pa.Table.from_pandas(
            df.groupby(["bin", "y"], as_index=False).sum(), preserve_index=False
        )

    o = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["bin", "y"])
        .aggregate(Sum("observed", alias_name="observed"))
        .to_pandas()
    )
    n = float(o["observed"].sum())
    rt = o.groupby("bin")["observed"].transform("sum").to_numpy(np.float64)
    ct = o.groupby("y")["observed"].transform("sum").to_numpy(np.float64)
    obs = o["observed"].to_numpy(np.float64)
    expected = np.floor(rt * ct / n * 1e6 + 0.5005) / 1e6
    contrib = np.floor((obs - expected) * (obs - expected) / expected * 1e6 + 0.5005) / 1e6
    return pd.DataFrame(
        {
            "bin": o["bin"].to_numpy(np.int32),
            "y": o["y"].to_numpy(np.int32),
            "observed": o["observed"].to_numpy(np.int64),
            "expected": expected,
            "contrib": contrib,
        }
    )


FE_CHI2_SQL = """
WITH mm AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
b AS (
  SELECT CAST(LEAST(GREATEST(CEIL((l_extendedprice - lo) / ((hi - lo) / 10.0)) - 1,
              0), 9) AS INT) AS bin,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem, mm
),
o AS (SELECT bin, y, count(*) AS observed FROM b GROUP BY 1, 2),
t AS (SELECT CAST(sum(observed) AS DOUBLE) AS n FROM o),
rt AS (SELECT bin, CAST(sum(observed) AS DOUBLE) AS rt FROM o GROUP BY 1),
ct AS (SELECT y, CAST(sum(observed) AS DOUBLE) AS ct FROM o GROUP BY 1),
e AS (
  SELECT o.bin, o.y, o.observed,
         floor(rt.rt * ct.ct / t.n * 1000000 + 0.5005) / 1000000 AS expected
  FROM o
  CROSS JOIN t
  JOIN rt ON o.bin = rt.bin
  JOIN ct ON o.y = ct.y
)
SELECT bin, y, observed, expected,
       floor((observed - expected) * (observed - expected) / expected
             * 1000000 + 0.5005) / 1000000 AS contrib
FROM e
"""


def d_quantile_norm(sf_dir: str):
    """Quantile normalization of document length across sources (the
    batch-effect/source-balance alignment step): each doc's n_chars is
    replaced by the mean n_chars at its within-source rank. Two bucket
    exchanges, both data-sized: one entity shuffle by source assigns
    within-source row_number (ties broken by doc_id), then a
    co-location by rank attaches the cross-source rank mean — the
    rank-mean table never collects on the driver (it is rows/sources
    long: data-sized at scale)."""
    from ..stages.bucketing import default_buckets
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"], split=True)
    B = default_buckets(ds)

    def rank_in_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"])
        rk = g.groupby("source").cumcount().to_numpy(np.int64) + 1
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "source": g["source"].to_numpy(),
                "n_chars": g["n_chars"].to_numpy(np.int64),
                "rk": rk,
            }
        )

    ranked = grouped_map(ds, "source", rank_in_source, num_buckets=B)

    def attach_rank_mean(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("rk")["n_chars"].transform("mean").to_numpy(np.float64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "source": g["source"].to_numpy(),
                "n_chars": g["n_chars"].to_numpy(np.int64),
                "qnorm": np.floor(m * 1e6 + 0.5005) / 1e6,
            }
        )

    out = grouped_map(ranked, "rk", attach_rank_mean, num_buckets=B).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


D_QUANTILE_NORM_SQL = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk
  FROM documents
),
m AS (SELECT rk, avg(n_chars) AS qval FROM r GROUP BY rk)
SELECT r.doc_id, r.source, r.n_chars,
       floor(m.qval * 1000000 + 0.5005) / 1000000 AS qnorm
FROM r JOIN m USING (rk)
ORDER BY r.doc_id
"""


def d_lexical_diversity(sf_dir: str):
    """Per-source lexical-diversity profile: type-token ratio, hapax
    ratio, and Simpson repetition index Σc(c−1)/(N(N−1)) over the
    corpus word distribution. Per-batch (source, word) partial counts
    co-locate by word hash (every partial for a word lands in one
    bucket), each bucket folds its final counts into four scalars per
    source, and an O(sources) cell exchange finishes — the word table
    itself never reaches the driver."""
    from ray.data.aggregate import Sum

    from ..stages.bucketing import default_buckets
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["source", "text"], split=True)
    B = default_buckets(ds)

    def cells(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        src = batch["source"].to_pandas()
        ex = s.str.findall(r"\S+").explode().dropna()
        if not len(ex):
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "w": pa.array([], type=pa.string()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        df = pd.DataFrame(
            {"source": src.iloc[ex.index].to_numpy(), "w": ex.to_numpy()}
        )
        out = df.groupby(["source", "w"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):  # empty bucket: keep the schema (names + dtypes)
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "types": pd.Series([], dtype=np.int64),
                    "hapax": pd.Series([], dtype=np.int64),
                    "tokens": pd.Series([], dtype=np.int64),
                    "s2": pd.Series([], dtype=np.int64),
                }
            )
        c = g.groupby(["source", "w"], sort=False)["c"].sum().reset_index()
        cc = c["c"].to_numpy(np.int64)
        agg = pd.DataFrame(
            {
                "source": c["source"],
                "types": 1,
                "hapax": (cc == 1).astype(np.int64),
                "tokens": cc,
                "s2": cc * (cc - 1),
            }
        )
        return agg.groupby("source", as_index=False).sum()

    parts = grouped_map(
        ds.map_batches(cells, batch_format="pyarrow"), "w", fold_bucket, num_buckets=B
    )
    out = (
        parts.groupby("source")
        .aggregate(
            Sum("types", alias_name="types"),
            Sum("hapax", alias_name="hapax"),
            Sum("tokens", alias_name="tokens"),
            Sum("s2", alias_name="s2"),
        )
        .to_pandas()
    )
    ty = out["types"].to_numpy(np.float64)
    hp = out["hapax"].to_numpy(np.float64)
    tk = out["tokens"].to_numpy(np.float64)
    s2 = out["s2"].to_numpy(np.float64)
    out["ttr"] = np.floor(ty / tk * 1e6 + 0.5005) / 1e6
    out["hapax_ratio"] = np.floor(hp / ty * 1e6 + 0.5005) / 1e6
    out["simpson"] = np.floor(s2 / (tk * (tk - 1.0)) * 1e6 + 0.5005) / 1e6
    return out.sort_values("source").reset_index(drop=True)


D_LEXICAL_DIVERSITY_SQL = """
WITH ex AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents
),
c AS (SELECT source, w, count(*) AS c FROM ex GROUP BY 1, 2),
s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         CAST(sum(c) AS BIGINT) AS tokens,
         CAST(sum(c * (c - 1)) AS BIGINT) AS s2
  FROM c GROUP BY 1
)
SELECT source, types, hapax, tokens, s2,
       floor(CAST(types AS DOUBLE) / CAST(tokens AS DOUBLE) * 1000000 + 0.5005)
         / 1000000 AS ttr,
       floor(CAST(hapax AS DOUBLE) / CAST(types AS DOUBLE) * 1000000 + 0.5005)
         / 1000000 AS hapax_ratio,
       floor(CAST(s2 AS DOUBLE) / (CAST(tokens AS DOUBLE) * (CAST(tokens AS DOUBLE) - 1.0))
             * 1000000 + 0.5005) / 1000000 AS simpson
FROM s
ORDER BY source
"""


def t_resample(sf_dir: str):
    """Per-user resample of the event stream onto a regular 6-hour grid
    with LINEAR interpolation between the bracketing events (the
    time-series regularization step upstream of any fixed-step window
    model; t_fill_forward is the step-function sibling). One entity
    shuffle; per user-segment the grid is a C-level arange and the
    brackets are two searchsorted calls (the same per-key-segment
    cursor as stages/temporal.py:rolling_agg). Duplicate (user, ts)
    rows are value-averaged first so both engines interpolate the same
    series; grid points on an event reproduce it exactly."""
    from ..stages.temporal import grouped_map

    STEP = 21_600_000_000  # 6 h in µs

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"], split=True)

    def interp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "ts"], as_index=False)["value"].mean()
        g = g.sort_values(["user_id", "ts"])
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        v = g["value"].to_numpy(np.float64)
        if not len(uid):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "value": pd.Series([], dtype=np.float64),
                }
            )
        seg = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        seg = np.r_[seg, len(uid)]
        out_u, out_t, out_v = [], [], []
        for a, b in zip(seg[:-1], seg[1:]):
            t_, v_ = ts[a:b], v[a:b]
            start = -(-t_[0] // STEP) * STEP  # smallest grid point ≥ first event
            if start > t_[-1]:
                continue
            grid = np.arange(start, t_[-1] + 1, STEP)
            ip = np.searchsorted(t_, grid, side="right") - 1
            jn = np.searchsorted(t_, grid, side="left")
            tp, vp = t_[ip], v_[ip]
            tn, vn = t_[jn], v_[jn]
            same = tn == tp
            f = (grid - tp).astype(np.float64) / np.where(
                same, 1.0, (tn - tp).astype(np.float64)
            )
            val = np.where(same, vp, vp + (vn - vp) * f)
            out_u.append(np.full(len(grid), uid[a], dtype=np.int64))
            out_t.append(grid)
            out_v.append(val)
        if not out_u:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "value": pd.Series([], dtype=np.float64),
                }
            )
        val = np.concatenate(out_v)
        return pd.DataFrame(
            {
                "user_id": np.concatenate(out_u),
                "ts": np.concatenate(out_t).astype("datetime64[us]"),
                "value": np.floor(val * 1e6 + 0.5005) / 1e6,
            }
        )

    out = grouped_map(ds, "user_id", interp).to_pandas()
    return out.sort_values(["user_id", "ts"]).reset_index(drop=True)


T_RESAMPLE_SQL = """
WITH e AS (SELECT user_id, ts, avg(value) AS v FROM events GROUP BY 1, 2),
u AS (SELECT user_id, epoch_us(min(ts)) AS mn, epoch_us(max(ts)) AS mx FROM e GROUP BY 1),
g AS (
  SELECT user_id,
         make_timestamp(unnest(generate_series(
           ((mn + 21599999999) // 21600000000) * 21600000000, mx, 21600000000))) AS ts
  FROM u
),
a AS (
  SELECT user_id, ts, v, 0 AS is_grid FROM e
  UNION ALL SELECT user_id, ts, NULL, 1 FROM g
),
w AS (
  SELECT user_id, ts, is_grid,
    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
    last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, is_grid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
    first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, is_grid
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn
  FROM a
)
SELECT user_id, ts,
  floor((CASE WHEN tn IS NULL OR tn = tp THEN vp
         ELSE vp + (vn - vp) * (CAST(epoch_us(ts) - epoch_us(tp) AS DOUBLE)
                                / CAST(epoch_us(tn) - epoch_us(tp) AS DOUBLE)) END)
        * 1000000 + 0.5005) / 1000000 AS value
FROM w WHERE is_grid = 1
ORDER BY user_id, ts
"""


def d_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov statistic between the n_chars
    distributions of English vs non-English documents — the
    distribution-drift audit that catches 'this shard's length profile
    is from a different crawl' (d_psi is its binned sibling; KS is
    binless). Per-batch distinct-value cells pre-aggregate, one
    value-histogram-sized exchange, and the driver folds exact integer
    cumulative counts — both engines divide the SAME exact integers,
    so the sup-difference matches bit-for-bit."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        en = (batch["lang"].to_pandas().fillna("") == "en").to_numpy(np.int64)
        df = pd.DataFrame(
            {"v": batch["n_chars"].to_numpy(), "en": en, "other": 1 - en}
        )
        return pa.Table.from_pandas(
            df.groupby("v", as_index=False).sum(), preserve_index=False
        )

    c = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("en", alias_name="en"), Sum("other", alias_name="other"))
        .to_pandas()
        .sort_values("v")
    )
    en = c["en"].to_numpy(np.int64)
    ot = c["other"].to_numpy(np.int64)
    n1, n0 = float(en.sum()), float(ot.sum())
    d = np.cumsum(en).astype(np.float64) / n1 - np.cumsum(ot).astype(np.float64) / n0
    ks = float(np.max(np.abs(d)))
    return pd.DataFrame(
        {
            "ks": [np.floor(ks * 1e6 + 0.5005) / 1e6],
            "n_en": [int(n1)],
            "n_other": [int(n0)],
        }
    )


D_KS_TEST_SQL = """
WITH c AS (
  SELECT n_chars AS v,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS en,
         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS other
  FROM documents GROUP BY 1
),
n AS (SELECT CAST(sum(en) AS DOUBLE) AS n1, CAST(sum(other) AS DOUBLE) AS n0 FROM c),
f AS (
  SELECT CAST(sum(en) OVER (ORDER BY v) AS DOUBLE) / n1
           - CAST(sum(other) OVER (ORDER BY v) AS DOUBLE) / n0 AS d
  FROM c, n
)
SELECT floor(max(abs(d)) * 1000000 + 0.5005) / 1000000 AS ks,
       (SELECT CAST(n1 AS BIGINT) FROM n) AS n_en,
       (SELECT CAST(n0 AS BIGINT) FROM n) AS n_other
FROM f
"""


def d_gini(sf_dir: str):
    """Per-source Gini coefficient of document length — the
    inequality/imbalance audit of a mixture (a source where a few huge
    docs carry most characters trains differently from a uniform one).
    One entity shuffle; within each source the ranked-sum identity
    G = 2·Σi·x(i)/(n·Σx) − (n+1)/n needs only three EXACT integer sums
    per source (deterministic (n_chars, doc_id) rank), so both engines
    evaluate the identical float expression."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"], split=True)

    def _exact_sum(a: np.ndarray, chunk: int = 1 << 20) -> int:
        # Σ of int64 terms as an arbitrary-precision Python int: each
        # ≤2^20-term chunk sums safely inside int64 (terms ≤ ~2^42 at
        # any plausible rank×length), chunks combine as Python ints —
        # matching SQL's HUGEINT sum exactly where a flat int64 sum
        # would silently wrap near 9.2e18 (≈4e7 docs × 1e4 chars).
        return sum(int(a[o : o + chunk].sum()) for o in range(0, len(a), chunk))

    def gini(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                    "gini": pd.Series([], dtype=np.float64),
                }
            )
        g = g.sort_values(["n_chars", "doc_id"])
        i = g.groupby("source").cumcount().to_numpy(np.int64) + 1
        x = g["n_chars"].to_numpy(np.int64)
        src = g["source"].to_numpy()
        order = np.argsort(src, kind="stable")
        src_s, i_s, x_s = src[order], i[order], x[order]
        seg = np.r_[np.flatnonzero(np.r_[True, src_s[1:] != src_s[:-1]]), len(src_s)]
        rows = []
        for a, b in zip(seg[:-1], seg[1:]):
            n = b - a
            # chunk sized so chunk × max-term stays inside int64
            tmax = max(int(n) * int(x_s[a:b].max()), 1)
            six = _exact_sum(i_s[a:b] * x_s[a:b], chunk=max(1, (1 << 62) // tmax))
            sx = _exact_sum(x_s[a:b])
            # float() here rounds the exact int to nearest — the same
            # conversion DuckDB applies casting its HUGEINT sum to DOUBLE
            val = 2.0 * float(six) / (float(n) * float(sx)) - (n + 1.0) / n
            rows.append((src_s[a], int(n), np.floor(val * 1e6 + 0.5005) / 1e6))
        return pd.DataFrame(rows, columns=["source", "n", "gini"])

    out = grouped_map(ds, "source", gini).to_pandas()
    return out.sort_values("source").reset_index(drop=True)


D_GINI_SQL = """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
  FROM documents
),
s AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(i * n_chars) AS DOUBLE) AS six,
         CAST(sum(n_chars) AS DOUBLE) AS sx
  FROM r GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n,
       floor((2.0 * six / (n * sx) - (n + 1.0) / n) * 1000000 + 0.5005)
         / 1000000 AS gini
FROM s ORDER BY source
"""


def d_sentence_stats(sf_dir: str):
    """Per-document sentence segmentation stats (sentence count on
    [.!?]+ boundaries + mean words per sentence) — the doc-structure
    features used by readability / quality filters that operate below
    the whole-doc level. Fully row-local (one vectorized split +
    explode per batch, zero exchange); docs with no sentence boundary
    and no text yield 0 sentences and a NULL mean."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        ex = s.str.split(r"[.!?]+", regex=True).explode()
        nonblank = ex.str.contains(r"\S", regex=True, na=False)
        n_sent = nonblank.groupby(level=0).sum().reindex(s.index, fill_value=0)
        n_sent = n_sent.to_numpy(np.int64)
        words = s.str.count(r"\S+").to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            msw = words.astype(np.float64) / n_sent.astype(np.float64)
        msw = np.floor(msw * 1e6 + 0.5005) / 1e6
        msw = np.where(n_sent == 0, np.nan, msw)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_sent": pa.array(n_sent),
                "n_words": pa.array(words),
                "mean_sent_words": pa.array(pd.Series(msw), from_pandas=True),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


D_SENTENCE_STATS_SQL = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '[.!?]+'),
                            x -> regexp_matches(x, '\\S'))) AS BIGINT) AS n_sent,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS BIGINT) AS n_words,
       CASE WHEN len(list_filter(string_split_regex(COALESCE(text, ''), '[.!?]+'),
                                 x -> regexp_matches(x, '\\S'))) = 0 THEN NULL
            ELSE floor(CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS DOUBLE)
                       / CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '[.!?]+'),
                                              x -> regexp_matches(x, '\\S'))) AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END AS mean_sent_words
FROM documents
"""


def t_forward_window(sf_dir: str):
    """Forward-looking label construction with an EMBARGO gap: for each
    event, the sum/count of the same user's values in [t+1h, t+7d]
    (both bounds INCLUSIVE — SQL RANGE FOLLOWING frames are closed; the
    embargo gap is the open interval (t, t+1h)) — the 'what happens
    next week, excluding anything close enough to leak' target used to
    train forecasting models (the mirror image of the trailing
    windows). One entity shuffle; per user-segment two searchsorted
    bounds against the sorted timestamps and a prefix-sum difference —
    no per-row scan."""
    from ..stages.temporal import grouped_map

    HOUR = 3_600_000_000
    DAY = 24 * HOUR

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"], split=True)

    def fwd(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        v = g["value"].to_numpy(np.float64)
        eid = g["event_id"].to_numpy(np.int64)
        fs = np.zeros(len(g))
        fn = np.zeros(len(g), dtype=np.int64)
        if len(g):
            seg = np.r_[np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]]), len(uid)]
            for a, b in zip(seg[:-1], seg[1:]):
                t_ = ts[a:b]
                cv = np.concatenate(([0.0], np.cumsum(v[a:b])))
                # frame is [t+1h, t+7d] inclusive both ends (SQL RANGE
                # FOLLOWING bounds are inclusive)
                lo = np.searchsorted(t_, t_ + HOUR, side="left")
                hi = np.searchsorted(t_, t_ + 7 * DAY, side="right")
                fs[a:b] = cv[hi] - cv[lo]
                fn[a:b] = hi - lo
        # biased half-up quantizer (NOT np.round: half-to-even vs SQL
        # round's half-away splits on exact 6dp halves, and the
        # prefix-diff vs window-sum float paths need the 0.5005 slack)
        return pd.DataFrame(
            {
                "event_id": eid,
                "fwd_sum": np.floor(fs * 1e6 + 0.5005) / 1e6,
                "fwd_n": fn,
            }
        )

    out = grouped_map(ds, "user_id", fwd).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


T_FORWARD_WINDOW_SQL = """
SELECT event_id,
       floor(COALESCE(sum(value) OVER w, 0) * 1000000 + 0.5005) / 1000000 AS fwd_sum,
       count(value) OVER w AS fwd_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR FOLLOWING
                       AND INTERVAL 7 DAY FOLLOWING)
ORDER BY event_id
"""


def q_percentile_exact(sf_dir: str):
    """EXACT grouped percentiles (p50/p90 of l_extendedprice per
    returnflag × linestatus) by global rank selection — the
    sketch-free sibling of q_grouped_median/q_grouped_p90: per-batch
    (group, value) count cells pre-aggregate, each group's value
    histogram co-locates in one bucket, and the selected element is
    the smallest value whose cumulative count reaches ⌈q·n⌉. The
    result is an ELEMENT of the input, so both engines agree
    bit-for-bit with no quantizer. Partitioning assumption: one
    group's distinct-value histogram fits a worker (same contract as
    any map_groups)."""
    from ..stages.temporal import grouped_map

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "grp": np.char.add(
                    np.char.add(
                        batch["l_returnflag"].to_numpy(zero_copy_only=False).astype(str),
                        "|",
                    ),
                    batch["l_linestatus"].to_numpy(zero_copy_only=False).astype(str),
                ),
                "v": batch["l_extendedprice"].to_numpy(),
                "c": 1,
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["grp", "v"], as_index=False).sum(), preserve_index=False
        )

    def select(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "grp": pd.Series([], dtype=object),
                    "p50": pd.Series([], dtype=np.float64),
                    "p90": pd.Series([], dtype=np.float64),
                }
            )
        c = g.groupby(["grp", "v"], as_index=False)["c"].sum().sort_values(["grp", "v"])
        rows = []
        for grp, gg in c.groupby("grp", sort=False):
            cum = gg["c"].to_numpy(np.int64).cumsum()
            n = cum[-1]
            vals = gg["v"].to_numpy(np.float64)
            p50 = vals[np.searchsorted(cum, -(-n // 2))]  # ceil(0.5 n)
            p90 = vals[np.searchsorted(cum, -(-(9 * n) // 10))]  # ceil(0.9 n)
            rows.append((grp, p50, p90))
        return pd.DataFrame(rows, columns=["grp", "p50", "p90"])

    out = grouped_map(
        ds.map_batches(cells, batch_format="pyarrow"), "grp", select
    ).to_pandas()
    return out.sort_values("grp").reset_index(drop=True)


Q_PERCENTILE_EXACT_SQL = """
WITH c AS (
  SELECT l_returnflag || '|' || l_linestatus AS grp, l_extendedprice AS v,
         count(*) AS c
  FROM lineitem GROUP BY 1, 2
),
k AS (
  SELECT grp, v,
         sum(c) OVER (PARTITION BY grp ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY grp) AS n
  FROM c
)
SELECT grp,
       min(CASE WHEN cum >= CAST(ceil(n / 2.0) AS BIGINT) THEN v END) AS p50,
       min(CASE WHEN cum >= CAST(ceil(n * 9 / 10.0) AS BIGINT) THEN v END) AS p90
FROM k GROUP BY grp ORDER BY grp
"""


def d_compress_ratio(sf_dir: str):
    """Per-document zlib compression ratio — the classic cheap
    repetitiveness/quality proxy (boilerplate and template spam
    compress far below natural text; Dolma/RefinedWeb-style pipelines
    threshold on it). Row-local actor-free map_batches; the
    compression itself is C-level per doc. No SQL oracle (zlib is not
    expressible) — deterministic, pytest-verified against the zlib
    module directly."""
    import zlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ratio(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        comp = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            b = (t or "").encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, 6))
        with np.errstate(invalid="ignore", divide="ignore"):
            r = comp.astype(np.float64) / raw.astype(np.float64)
        r = np.floor(r * 1e6 + 0.5005) / 1e6
        r = np.where(raw == 0, np.nan, r)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "raw_bytes": pa.array(raw),
                "comp_bytes": pa.array(comp),
                "ratio": pa.array(pd.Series(r), from_pandas=True),
            }
        )

    return ds.map_batches(ratio, batch_format="pyarrow")


def d_span_corruption(sf_dir: str):
    """T5/BERT-style span-corruption masking LAYOUT over the token
    table: a position starts a mask span iff a public replayable hash
    of (doc ordinal, position) falls under 5%, spans run 3 tokens and
    merge when they overlap — per doc the masked-token count, merged
    span count, and mask fraction. Fully row-local (the flat Arrow
    token buffer gives per-doc position indices; the 3-token dilation
    is two guarded shifts); the SQL oracle replays the hash in HUGEINT
    and re-derives the dilation with a ROWS 2 PRECEDING window max.
    Hash bound: doc ordinal < 2.3e12 keeps the affine input inside
    mod-2^61-1 single-word range (same contract as the other
    replayable-hash ops)."""
    from ..sources.token_table import token_table_dataset
    from ..stages.text import _mulmod61

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    if n <= 30000:
        ensure_tok_oracle_fixtures(ns=(n,))
    M = np.uint64((1 << 61) - 1)
    A = np.uint64(1752450205419405103)  # 6364136223846793005 mod 2^61-1
    B = np.uint64(1152921504607846959)  # 2^60 + 999983 (wrapping premix)

    def spans(batch: pa.Table) -> pa.Table:
        col = batch["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)
        nrows = len(lens)
        did = (
            pd.Series(batch["doc_id"].to_pandas())
            .str.slice(4)
            .astype(np.int64)
            .to_numpy()
        )
        # flat per-position arrays: doc index + 1-based position
        docidx = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        pos = np.arange(offs[-1] - offs[0], dtype=np.int64) - np.repeat(
            offs[:-1] - offs[0], lens
        ) + 1
        key = (did[docidx] * 1000003 + pos).astype(np.uint64)
        h = _mulmod61(key, np.broadcast_to(A, key.shape)) + B
        h = np.where(h >= M, h - M, h)
        st = ((h % np.uint64(100)) < np.uint64(5)).astype(np.int8)
        mask = st.copy()
        for k in (1, 2):
            sh = np.concatenate([np.zeros(k, dtype=np.int8), st[:-k]]) if len(st) > k else np.zeros_like(st)
            mask |= np.where(pos > k, sh, 0).astype(np.int8)
        prev = np.concatenate([np.zeros(1, dtype=np.int8), mask[:-1]]) if len(mask) else mask
        runstart = (mask == 1) & ((pos == 1) | (prev == 0))
        n_masked = np.bincount(docidx, weights=mask, minlength=nrows).astype(np.int64)
        n_spans = np.bincount(docidx, weights=runstart, minlength=nrows).astype(np.int64)
        frac = n_masked.astype(np.float64) / np.maximum(lens, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tok": pa.array(lens),
                "n_masked": pa.array(n_masked),
                "n_spans": pa.array(n_spans),
                "mask_frac": pa.array(np.floor(frac * 1e6 + 0.5005) / 1e6),
            }
        )

    return token_table_dataset(n).map_batches(spans, batch_format="pyarrow")


D_SPAN_CORRUPTION_SQL = f"""
WITH t AS (
  SELECT doc_id, tokens
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_full_30000_seed42.parquet')
),
u AS (
  SELECT doc_id, unnest(tokens) AS _tok,
         generate_subscripts(tokens, 1) AS i
  FROM t
),
s AS (
  SELECT doc_id, i,
         CASE WHEN ((CAST(substr(doc_id, 5) AS HUGEINT) * 1000003 + i)
                    * 1752450205419405103 + 1152921504607846959)
                   % 2305843009213693951 % 100 < 5 THEN 1 ELSE 0 END AS st
  FROM u
),
m AS (
  SELECT doc_id, i, st,
         max(st) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mask
  FROM s
),
m2 AS (
  SELECT doc_id, mask,
         CASE WHEN mask = 1 AND COALESCE(lag(mask) OVER (PARTITION BY doc_id ORDER BY i), 0) = 0
              THEN 1 ELSE 0 END AS runstart
  FROM m
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_tok,
       CAST(sum(mask) AS BIGINT) AS n_masked,
       CAST(sum(runstart) AS BIGINT) AS n_spans,
       floor(CAST(sum(mask) AS DOUBLE) / count(*) * 1000000 + 0.5005) / 1000000 AS mask_frac
FROM m2 GROUP BY doc_id
"""


def d_readability(sf_dir: str):
    """Flesch reading-ease per document (206.835 − 1.015·W/S −
    84.6·Y/W with vowel-group syllable estimates — the standard cheap
    readability quality signal). Row-local: three vectorized regex
    counts per batch, zero exchange; NULL where the doc has no words
    or no sentence boundary. Both engines evaluate the identical
    left-associated float expression over exact integer counts, then
    the shared 6dp quantizer."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def flesch(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        w = s.str.count(r"\S+").to_numpy(np.int64)
        seg = s.str.split(r"[.!?]+", regex=True).explode()
        nonblank = seg.str.contains(r"\S", regex=True, na=False)
        sent = (
            nonblank.groupby(level=0).sum().reindex(s.index, fill_value=0)
        ).to_numpy(np.int64)
        y = s.str.count(r"[aeiouyAEIOUY]+").to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            val = (
                206.835
                - 1.015 * (w.astype(np.float64) / sent.astype(np.float64))
                - 84.6 * (y.astype(np.float64) / w.astype(np.float64))
            )
        val = np.floor(val * 1e6 + 0.5005) / 1e6
        val = np.where((sent == 0) | (w == 0), np.nan, val)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(w),
                "n_sentences": pa.array(sent),
                "n_syllables": pa.array(y),
                "flesch": pa.array(pd.Series(val), from_pandas=True),
            }
        )

    return ds.map_batches(flesch, batch_format="pyarrow")


D_READABILITY_SQL = """
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS BIGINT) AS w,
         CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '[.!?]+'),
                              x -> regexp_matches(x, '\\S'))) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '[aeiouyAEIOUY]+')) AS BIGINT) AS y
  FROM documents
)
SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
       CASE WHEN s = 0 OR w = 0 THEN NULL
            ELSE floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                        - 84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)))
                       * 1000000 + 0.5005) / 1000000 END AS flesch
FROM c
"""


def q_upsert(sf_dir: str):
    """MERGE/upsert semantics (the lakehouse CDC-apply step): a derived
    change set (updates for o_orderkey % 7 = 0 at +10.0; inserts at
    key+100000000 for o_orderkey % 9731 = 0) applied onto the base
    orders table — matched rows take the new price, unmatched changes
    insert, everything else passes through. One bucketed full-outer
    exchange via the shared shuffle_hash_join; COALESCE resolves the
    surviving side."""
    from ..stages.partition import shuffle_hash_join

    base = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def changes(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy()
        p = batch["o_totalprice"].to_numpy()
        upd = k % 7 == 0
        ins = k % 9731 == 0
        return pa.table(
            {
                "u_orderkey": pa.array(
                    np.concatenate([k[upd], k[ins] + 100000000])
                ),
                "u_price": pa.array(
                    np.concatenate([p[upd] + 10.0, np.full(ins.sum(), 1.0)])
                ),
            }
        )

    upd_ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).map_batches(
        changes, batch_format="pyarrow"
    )
    joined = shuffle_hash_join(
        base, upd_ds, left_on="o_orderkey", right_on="u_orderkey",
        join_type="full outer",
    )

    def resolve(batch: pa.Table) -> pa.Table:
        # the bucketed full-outer join already COALESCEd the key, so
        # unmatched inserts carry their own key; price resolution is
        # pure Arrow coalesce (values pass through bit-identically —
        # no rounding needed on either side)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "price": pc.coalesce(batch["u_price"], batch["o_totalprice"]),
                "is_new": pc.is_null(batch["o_totalprice"]),
            }
        )

    return joined.map_batches(resolve, batch_format="pyarrow")


Q_UPSERT_SQL = """
WITH chg AS (
  SELECT o_orderkey AS u_orderkey, o_totalprice + 10.0 AS u_price
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, 1.0 FROM orders WHERE o_orderkey % 9731 = 0
)
SELECT COALESCE(o.o_orderkey, c.u_orderkey) AS o_orderkey,
       COALESCE(c.u_price, o.o_totalprice) AS price,
       o.o_orderkey IS NULL AS is_new
FROM orders o FULL OUTER JOIN chg c ON o.o_orderkey = c.u_orderkey
"""


def d_ann_recall(sf_dir: str):
    """ANN quality harness: recall@5 of the IVF index against the
    exact brute-force neighbors for the same queries — the eval loop
    that tunes (n_clusters, nprobe) before trusting the approximate
    path at scale. Rows-only (both sides are the engine's own ANN
    pipelines); pytest pins the deterministic values."""
    from ..stages.similarity import knn_bruteforce, knn_ivf

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 8")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.stack(q["embedding"].to_numpy())
    qids = q["vec_id"].to_numpy()
    exact = knn_bruteforce(ds, queries, k=5, query_ids=qids)
    approx = knn_ivf(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        queries, k=5, n_clusters=8, nprobe=3,
    )
    rows = []
    for qid in qids:
        e = set(exact.loc[exact["query_id"] == qid, "id"])
        a = set(approx.loc[approx["query_id"] == qid, "id"])
        rows.append((int(qid), len(e & a) / max(len(e), 1)))
    out = pd.DataFrame(rows, columns=["query_id", "recall_at_5"])
    out["recall_at_5"] = np.floor(out["recall_at_5"] * 1e6 + 0.5005) / 1e6
    return out


def d_triangle_count(sf_dir: str):
    """Per-node triangle counts over the co-supplier graph (suppliers
    connected iff they share ≥2 distinct parts in the l_orderkey%16
    slice) — the classic graph-locality signal (clustering/community
    strength) built the distributed way: (1) part-co-located pair
    emission with in-bucket distinct, (2) pair-co-located shared-part
    counting → edge set, (3) wedge generation at each edge's LOWER
    endpoint, (4) one bucketed hash join of wedges against edges on the
    closing pair, (5) an O(nodes) count exchange. At skewed scale the
    wedge phase must orient edges by (degree, id) instead of raw id so
    hubs don't fan out O(d²) — noted here, id-orientation is correct
    and sufficient for the evaluated graphs. Key packing bound:
    supplier ids < 2^31."""
    from ray.data.aggregate import Sum

    from ..stages.partition import shuffle_hash_join
    from ..stages.temporal import grouped_map

    K = np.int64(1) << 31

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_suppkey"],
        where=pc.bit_wise_and(pc.field("l_orderkey"), 15) == 0,
    )

    def ps_cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "p": batch["l_partkey"].to_numpy(),
                "s": batch["l_suppkey"].to_numpy(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["p", "s"]).sort_values(["p", "s"])
        outs = []
        for _, gg in g.groupby("p", sort=False):
            s = gg["s"].to_numpy(np.int64)
            if len(s) < 2:
                continue
            iu = np.triu_indices(len(s), k=1)
            outs.append(np.stack([s[iu[0]], s[iu[1]]], axis=1))
        if not outs:
            return pd.DataFrame({"pk": pd.Series([], dtype=np.int64)})
        ab = np.concatenate(outs)
        return pd.DataFrame({"pk": ab[:, 0] * K + ab[:, 1]})

    pairs = grouped_map(
        li.map_batches(ps_cells, batch_format="pyarrow"), "p", part_pairs
    )

    def shared_filter(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("pk").size()
        keep = c[c >= 2].index.to_numpy(np.int64)
        return pd.DataFrame({"a": keep // K, "b": keep % K})

    # the edge set feeds TWO consumers (wedge generation + the closing-
    # edge probe); materialize once so the part/pair exchanges don't
    # re-execute per consumer. Edges are the sparse graph itself —
    # exactly what an iterative graph engine holds resident.
    edges = grouped_map(pairs, "pk", shared_filter).materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["a", "b"])
        outs = []
        for _, gg in g.groupby("a", sort=False):
            nb = gg["b"].to_numpy(np.int64)
            if len(nb) < 2:
                continue
            iu = np.triu_indices(len(nb), k=1)
            apex = np.full(len(iu[0]), gg["a"].iloc[0], dtype=np.int64)
            outs.append(
                pd.DataFrame({"wk": nb[iu[0]] * K + nb[iu[1]], "apex": apex})
            )
        if not outs:
            return pd.DataFrame(
                {"wk": pd.Series([], dtype=np.int64), "apex": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    w = grouped_map(edges, "a", wedges)

    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pa.table({"ek": pa.array(a * K + b)})

    tri = shuffle_hash_join(
        w, edges.map_batches(edge_keys, batch_format="pyarrow"),
        left_on="wk", right_on="ek", join_type="inner",
    )

    def node_cells(batch: pa.Table) -> pa.Table:
        wk = batch["wk"].to_numpy()
        apex = batch["apex"].to_numpy()
        s = np.concatenate([apex, wk // K, wk % K])
        df = pd.DataFrame({"suppkey": s, "n_triangles": 1})
        return pa.Table.from_pandas(
            df.groupby("suppkey", as_index=False).sum(), preserve_index=False
        )

    out = (
        tri.map_batches(node_cells, batch_format="pyarrow")
        .groupby("suppkey")
        .aggregate(Sum("n_triangles", alias_name="n_triangles"))
        .to_pandas()
    )
    out["n_triangles"] = out["n_triangles"].astype(np.int64)
    return out.sort_values("suppkey").reset_index(drop=True)


D_TRIANGLE_COUNT_SQL = """
WITH sp AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
  WHERE l_orderkey % 16 = 0
),
e AS (
  SELECT a.s AS a, b.s AS b
  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
  GROUP BY 1, 2 HAVING count(*) >= 2
),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1 JOIN e e2 ON e2.a = e1.b
       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT s AS suppkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS s FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY s ORDER BY s
"""


def d_conversation(sf_dir: str):
    """Conversation assembly (chat-log → training-doc): each user's
    events sessionize on a 30-minute gap (same rule as t_sessionize)
    and each session's event_type sequence concatenates in (ts,
    event_id) order into one pipe-joined string with its event count —
    the multi-turn document-construction step of a dialogue corpus.
    One entity shuffle; session assignment and ordering are C-level,
    the string join is the unavoidable per-session concat."""
    from ..stages.temporal import grouped_map

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"],
        split=True,
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "session_idx": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "convo": pd.Series([], dtype=object),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[0, ts[1:] - ts[:-1]] > 1_800_000_000
        new_sess = new_user | gap
        # per-user 0-based session index: cumulative new-session count
        # minus its value at the user's first row
        cs = np.cumsum(new_sess)
        first = np.repeat(cs[new_user], np.diff(np.r_[np.flatnonzero(new_user), len(uid)]))
        g = g.assign(session_idx=(cs - first).astype(np.int64))
        agg = g.groupby(["user_id", "session_idx"], sort=False).agg(
            n_events=("event_type", "size"), convo=("event_type", "|".join)
        )
        return agg.reset_index()

    out = grouped_map(ds, "user_id", assemble).to_pandas()
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


D_CONVERSATION_SQL = """
WITH s AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
  FROM (
    SELECT event_id, user_id, ts, event_type,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
)
SELECT user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       string_agg(event_type, '|' ORDER BY ts, event_id) AS convo
FROM s GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def q_table_checksum(sf_dir: str):
    """Order-insensitive table fingerprint (the replication/integrity
    audit: re-run after a copy or a backfill and compare one row): a
    replayable per-row hash of (o_orderkey, o_custkey, exact cents of
    o_totalprice) mod 2^61−1, aggregated as BOTH a modular sum and a
    bitwise XOR plus the row count. Per-batch partials only — an
    O(batches) fold, no shuffle at all. The 32-bit split keeps the
    modular sum exact in int64 at any batch size; key bound:
    o_orderkey < 2.3e12 (same single-word contract as the other
    replayable hashes)."""
    from ..stages.text import _mulmod61

    M = (1 << 61) - 1
    A = np.uint64(1752450205419405103)
    B = np.uint64(1152921504607846959)

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def part(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy().astype(np.uint64)
        c = batch["o_custkey"].to_numpy().astype(np.uint64)
        cents = np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.uint64)
        t1 = k * np.uint64(1000003) + c
        h1 = _mulmod61(t1, np.broadcast_to(A, t1.shape)) + B
        h1 = np.where(h1 >= np.uint64(M), h1 - np.uint64(M), h1)
        h = _mulmod61(h1, np.broadcast_to(A, h1.shape)) + cents
        h = np.where(h >= np.uint64(M), h - np.uint64(M), h)
        # exact modular sum via 32-bit split (Σ of 2^61-sized terms
        # overflows uint64 after 8 rows; the split sums stay exact)
        lo = int((h & np.uint64(0xFFFFFFFF)).sum())
        hi = int((h >> np.uint64(32)).sum())
        s = (hi * (1 << 32) + lo) % M
        x = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        return pa.table(
            {
                "s": pa.array([s], type=pa.int64()),
                "x": pa.array([x], type=pa.int64()),
                "n": pa.array([len(h)], type=pa.int64()),
            }
        )

    tot_s, tot_x, tot_n = 0, 0, 0
    for row in ds.map_batches(part, batch_format="pyarrow", batch_size=None).take_all():
        tot_s = (tot_s + row["s"]) % M
        tot_x ^= row["x"]
        tot_n += row["n"]
    return pd.DataFrame(
        {"n": [tot_n], "checksum_sum": [tot_s], "checksum_xor": [tot_x]}
    )


Q_TABLE_CHECKSUM_SQL = """
WITH h AS (
  SELECT CAST(
           (((CAST(o_orderkey AS HUGEINT) * 1000003 + o_custkey)
             * 1752450205419405103 + 1152921504607846959) % 2305843009213693951
            * 1752450205419405103
            + CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT))
           % 2305843009213693951 AS BIGINT) AS h
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(h AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS checksum_sum,
       CAST(bit_xor(h) AS BIGINT) AS checksum_xor
FROM h
"""


def tok_crop(sf_dir: str):
    """Deterministic context-window cropping (the dataloader random-crop
    made replayable): every doc longer than 64 tokens takes a 64-token
    window whose start is a public affine hash of the doc ordinal mod
    the valid-start span; short docs pass whole. Emits the crop bounds
    AND the first cropped token (a token-level probe so the oracle
    verifies actual list indexing, not just arithmetic). Row-local over
    the flat Arrow token buffer — zero exchange."""
    from ..sources.token_table import token_table_dataset
    from ..stages.text import _mulmod61

    n = {"sf0.001": 3000, "sf0.01": 30000, "sf0.1": 300000}.get(
        sf_dir.rstrip("/").split("/")[-1], 3000
    )
    if n <= 30000:
        ensure_tok_oracle_fixtures(ns=(n,))
    W = 64
    M = np.uint64((1 << 61) - 1)
    A = np.uint64(1752450205419405103)
    B = np.uint64(1152921504607846959)

    def crop(batch: pa.Table) -> pa.Table:
        col = batch["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy().astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        did = (
            pd.Series(batch["doc_id"].to_pandas()).str.slice(4).astype(np.int64)
        ).to_numpy().astype(np.uint64)
        h = _mulmod61(did, np.broadcast_to(A, did.shape)) + B
        h = np.where(h >= M, h - M, h)
        span = np.maximum(lens - (W - 1), 1).astype(np.uint64)
        start = np.where(lens > W, (h % span).astype(np.int64), 0)
        crop_len = np.minimum(lens, W)
        # offsets are ABSOLUTE into the child values buffer (a sliced
        # ListArray keeps full child + shifted offsets) — no offs[0]
        # normalization here, unlike the per-position arange above
        first = vals[offs[:-1] + start]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tok": pa.array(lens),
                "crop_start": pa.array(start),
                "crop_len": pa.array(crop_len),
                "crop_first_tok": pa.array(first.astype(np.int32)),
            }
        )

    return token_table_dataset(n).map_batches(crop, batch_format="pyarrow")


TOK_CROP_SQL = f"""
WITH t AS (
  SELECT doc_id, tokens, len(tokens) AS n_tok
  FROM read_parquet('{TOK_ORACLE_DIR}/tokens_full_30000_seed42.parquet')
),
h AS (
  SELECT doc_id, tokens, n_tok,
         (CAST(substr(doc_id, 5) AS HUGEINT) * 1752450205419405103
          + 1152921504607846959) % 2305843009213693951 AS hv
  FROM t
),
c AS (
  SELECT doc_id, tokens, n_tok,
         CASE WHEN n_tok > 64 THEN CAST(hv % (n_tok - 63) AS BIGINT) ELSE 0 END AS crop_start
  FROM h
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, crop_start,
       CAST(least(n_tok, 64) AS BIGINT) AS crop_len,
       tokens[crop_start + 1] AS crop_first_tok
FROM c
"""


def d_html_strip(sf_dir: str):
    """Markup/boilerplate stripping (the HTML-extraction step of a web
    corpus): a deterministic tag wrap + trailing script block is
    injected on doc_id % 5 = 0 (the fixture corpus is plain text), then
    the strip removes script blocks and every remaining tag — per doc
    the removed-tag count, cleaned length, and whether the doc
    changed. Vectorized regex per batch, zero exchange; the oracle
    replays injection and strip with the same RE2-compatible
    patterns."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def strip(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        did = batch["doc_id"].to_numpy()
        wrapped = pd.Series(
            np.where(
                did % 5 == 0,
                '<div class="t"><p>' + s + "</p></div><script>junk()</script>",
                s,
            )
        )
        noscript = wrapped.str.replace(
            r"<script>[^<]*</script>", "", regex=True
        )
        n_tags = noscript.str.count(r"<[^>]*>").to_numpy(np.int64) + (
            (did % 5 == 0).astype(np.int64)  # the script block itself
        )
        clean = noscript.str.replace(r"<[^>]*>", "", regex=True)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tags": pa.array(n_tags),
                "clean_len": pa.array(clean.str.len().to_numpy(np.int64)),
                "changed": pa.array((did % 5 == 0)),
            }
        )

    return ds.map_batches(strip, batch_format="pyarrow")


D_HTML_STRIP_SQL = """
WITH w AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN '<div class="t"><p>' || COALESCE(text, '')
                   || '</p></div><script>junk()</script>'
              ELSE COALESCE(text, '') END AS t,
         doc_id % 5 = 0 AS injected
  FROM documents
),
ns AS (
  SELECT doc_id, injected,
         regexp_replace(t, '<script>[^<]*</script>', '', 'g') AS t
  FROM w
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '<[^>]*>'))
            + CASE WHEN injected THEN 1 ELSE 0 END AS BIGINT) AS n_tags,
       CAST(length(regexp_replace(t, '<[^>]*>', '', 'g')) AS BIGINT) AS clean_len,
       injected AS changed
FROM ns
"""


def d_wilson_ci(sf_dir: str):
    """Per-source C4 keep-rate with a Wilson 95% confidence interval —
    'is this source's quality SIGNIFICANTLY worse, or is it just
    small?' (the audit that stops over-reacting to a 12-doc shard).
    O(sources) cell exchange of exact (kept, n) integers; both engines
    then evaluate the token-identical Wilson expression."""
    from ray.data.aggregate import Sum

    from ..stages.text import c4_keep_mask

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        keep = c4_keep_mask(s).astype(np.int64)
        df = pd.DataFrame(
            {"source": batch["source"].to_pandas().fillna(""), "kept": keep, "n": 1}
        )
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False
        )

    out = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("kept", alias_name="kept"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    k = out["kept"].to_numpy(np.float64)
    n = out["n"].to_numpy(np.float64)
    p = k / n
    half = 1.96 * np.sqrt((p * (1 - p) + 1.96 * 1.96 / (4 * n)) / n)
    center = p + 1.96 * 1.96 / (2 * n)
    denom = 1 + 1.96 * 1.96 / n
    out["p_keep"] = _q6(p)
    out["wilson_lo"] = _q6((center - half) / denom)
    out["wilson_hi"] = _q6((center + half) / denom)
    out["kept"] = out["kept"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


D_WILSON_CI_SQL = """
WITH c AS (
  SELECT COALESCE(source, '') AS source,
         CAST(sum(CASE WHEN
                length(regexp_extract_all(text, '\\S+')) BETWEEN 30 AND 10000
            AND length(regexp_replace(text, '\\s+', '', 'g'))
                / greatest(length(regexp_extract_all(text, '\\S+')), 1) <= 4.6
            AND position('{' IN text) = 0
            AND position('lorem ipsum' IN lower(text)) = 0
          THEN 1 ELSE 0 END) AS BIGINT) AS kept,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1
),
f AS (
  SELECT source, kept, n,
         CAST(kept AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         CAST(n AS DOUBLE) AS nd
  FROM c
)
SELECT source, kept, n,
  floor(p * 1000000 + 0.5005) / 1000000 AS p_keep,
  floor(((p + 1.96 * 1.96 / (2 * nd)
          - 1.96 * sqrt((p * (1 - p) + 1.96 * 1.96 / (4 * nd)) / nd))
         / (1 + 1.96 * 1.96 / nd)) * 1000000 + 0.5005) / 1000000 AS wilson_lo,
  floor(((p + 1.96 * 1.96 / (2 * nd)
          + 1.96 * sqrt((p * (1 - p) + 1.96 * 1.96 / (4 * nd)) / nd))
         / (1 + 1.96 * 1.96 / nd)) * 1000000 + 0.5005) / 1000000 AS wilson_hi
FROM f ORDER BY source
"""


def q_moments(sf_dir: str):
    """Grouped skewness / excess kurtosis (population definitions) of
    l_discount per returnflag from ONE pass of per-batch power-sum
    partials (n, Σx, Σx², Σx³, Σx⁴ per group — O(groups) floats per
    batch, tiny cell exchange). The small-magnitude column keeps the
    raw-moment expansion well-conditioned; both engines expand the
    central moments with the token-identical expression."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_discount"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch["l_returnflag"].to_numpy(zero_copy_only=False),
                "x": batch["l_discount"].to_numpy(),
            }
        )
        gg = df.groupby("g")["x"]
        out = pd.DataFrame(
            {
                "n": gg.size(),
                "s1": gg.sum(),
                "s2": gg.apply(lambda v: float((v**2).sum())),
                "s3": gg.apply(lambda v: float((v**3).sum())),
                "s4": gg.apply(lambda v: float((v**4).sum())),
            }
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
            Sum("s3", alias_name="s3"),
            Sum("s4", alias_name="s4"),
        )
        .to_pandas()
    )
    n = agg["n"].to_numpy(np.float64)
    s1, s2 = agg["s1"].to_numpy(np.float64), agg["s2"].to_numpy(np.float64)
    s3, s4 = agg["s3"].to_numpy(np.float64), agg["s4"].to_numpy(np.float64)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
    m4 = s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu
    skew = m3 / m2**1.5
    kurt = m4 / (m2 * m2) - 3
    return pd.DataFrame(
        {
            "l_returnflag": agg["g"],
            "n": agg["n"].astype(np.int64),
            "skewness": _q6(skew),
            "excess_kurtosis": _q6(kurt),
        }
    ).sort_values("l_returnflag").reset_index(drop=True)


Q_MOMENTS_SQL = """
WITH s AS (
  SELECT l_returnflag AS g, CAST(count(*) AS DOUBLE) AS n,
         sum(l_discount) AS s1,
         sum(l_discount * l_discount) AS s2,
         sum(l_discount * l_discount * l_discount) AS s3,
         sum(l_discount * l_discount * l_discount * l_discount) AS s4
  FROM lineitem GROUP BY 1
),
m AS (
  SELECT g, n, s1 / n AS mu, s2, s3, s4,
         s2 / n - (s1 / n) * (s1 / n) AS m2
  FROM s
),
f AS (
  SELECT g, n, m2,
         s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu AS m3,
         s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n)
           - 3 * mu * mu * mu * mu AS m4
  FROM m
)
SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
       floor((m3 / pow(m2, 1.5)) * 1000000 + 0.5005) / 1000000 AS skewness,
       floor((m4 / (m2 * m2) - 3) * 1000000 + 0.5005) / 1000000 AS excess_kurtosis
FROM f ORDER BY l_returnflag
"""


def fe_polynomial(sf_dir: str):
    """Degree-2 polynomial feature expansion (sklearn PolynomialFeatures
    analog over the candidate algebra: squares via the ufunc producer,
    cross terms via the commutative product) — backfilled through the
    same expression-DAG machinery as every other fe_* pipeline and
    hash-checked against SQL arithmetic."""
    from ..functions.expr import binary, npfunc

    def build(f):
        return [
            npfunc("square", f["l_quantity"]),
            npfunc("square", f["l_discount"]),
            binary("mul", f["l_quantity"], f["l_discount"]),
            binary("mul", f["l_quantity"], f["l_tax"]),
        ]

    return _lineitem_features(
        sf_dir,
        {"stats": ["l_quantity", "l_discount", "l_tax"], "build": build},
        keep=["l_orderkey", "l_linenumber"],
        rename={
            "np.square(l_quantity)": "qty_sq",
            "np.square(l_discount)": "disc_sq",
            "(l_discount*l_quantity)": "qty_disc",
            "(l_quantity*l_tax)": "qty_tax",
        },
        rounding={"qty_sq": 6, "disc_sq": 6, "qty_disc": 6, "qty_tax": 6},
    )


FE_POLYNOMIAL_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_quantity * l_quantity, 6) AS qty_sq,
       round(l_discount * l_discount, 6) AS disc_sq,
       round(l_discount * l_quantity, 6) AS qty_disc,
       round(l_quantity * l_tax, 6) AS qty_tax
FROM lineitem
"""


def fe_cyclic(sf_dir: str):
    """Cyclic (sin/cos) encoding of event hour-of-day — the standard
    periodic-feature transform that keeps 23:00 adjacent to 00:00 where
    a raw hour integer breaks the circle. Row-local; both engines
    evaluate sin/cos on the identical 2π·h/24 doubles (explicit π
    literal) and quantize at 6dp, absorbing sub-ulp libm differences."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def enc(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[us]")
        h = (ts.view(np.int64) // 3_600_000_000) % 24
        ang = 2.0 * 3.141592653589793 * (h.astype(np.float64) / 24.0)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "hour": pa.array(h.astype(np.int64)),
                "hour_sin": pa.array(_q6(np.sin(ang))),
                "hour_cos": pa.array(_q6(np.cos(ang))),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


FE_CYCLIC_SQL = """
SELECT event_id,
       CAST(extract(hour FROM ts) AS BIGINT) AS hour,
       floor(sin(2.0 * 3.141592653589793 * (extract(hour FROM ts) / 24.0))
             * 1000000 + 0.5005) / 1000000 AS hour_sin,
       floor(cos(2.0 * 3.141592653589793 * (extract(hour FROM ts) / 24.0))
             * 1000000 + 0.5005) / 1000000 AS hour_cos
FROM events
"""


def fe_crosshash(sf_dir: str):
    """Hashed cross features (the hashing-trick over a CATEGORICAL
    CROSS, user_id × event_type → 128 buckets): the pair funnels
    through the shared replayable affine hash mod 2^61−1 so the oracle
    re-derives every bucket id; the classic wide-and-deep cross-column
    encode at vocabulary-free memory cost. Row-local, zero exchange.
    Uses the event_type ordinal via a fixed public code list (the
    fixture's closed type set) — an open vocabulary would route through
    horner_mod61 like d_hash_features."""
    from ..stages.text import _mulmod61

    M = np.uint64((1 << 61) - 1)
    A = np.uint64(1752450205419405103)
    B = np.uint64(1152921504607846959)
    TYPES = ("click", "view", "purchase", "signup", "error")

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def cross(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy().astype(np.uint64)
        et = batch["event_type"].to_pandas().fillna("")
        code = et.map({t: i + 1 for i, t in enumerate(TYPES)}).fillna(0).to_numpy(
            np.uint64
        )
        t1 = u * np.uint64(1009) + code
        h = _mulmod61(t1, np.broadcast_to(A, t1.shape)) + B
        h = np.where(h >= M, h - M, h)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "cross_bucket": pa.array((h % np.uint64(128)).astype(np.int64)),
            }
        )

    return ds.map_batches(cross, batch_format="pyarrow")


FE_CROSSHASH_SQL = """
SELECT event_id,
       CAST(((CAST(user_id AS HUGEINT) * 1009
              + CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                                WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                                WHEN 'error' THEN 5 ELSE 0 END)
             * 1752450205419405103 + 1152921504607846959)
            % 2305843009213693951 % 128 AS BIGINT) AS cross_bucket
FROM events
"""


def d_auc(sf_dir: str):
    """Per-source exact ROC AUC (tie-corrected Mann-Whitney) of document
    length predicting lang='en' — the eval primitive behind quality-
    classifier audits. Like q_spearman, NO row is ever ranked: per-batch
    (source, n_chars) cells with positive counts pre-aggregate inside
    map_batches, one cell-cardinality exchange sums them, and the driver
    derives AUC per source from prefix sums of negatives in value order.
    2×rank-sum arithmetic stays in exact int64 until the single final
    division (6dp-quantized on both sides); a NULL lang counts as
    negative in both engines (n − n_pos)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars", "lang"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "v": batch["n_chars"].to_numpy(),
            "pos": (batch["lang"].to_pandas() == "en").astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "v"], as_index=False).sum(), preserve_index=False
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("pos", alias_name="pos"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["source", "v"])
    )
    pos = jc["pos"].to_numpy(np.int64)
    neg = jc["n"].to_numpy(np.int64) - pos
    # exclusive per-source prefix sum of negatives in value order
    grp = jc["source"].to_numpy(object)
    new = np.ones(len(jc), dtype=bool)
    new[1:] = grp[1:] != grp[:-1]
    cneg = np.cumsum(neg) - neg
    starts = np.flatnonzero(new)
    base = np.repeat(cneg[starts], np.diff(np.r_[starts, len(jc)]))
    neg_before = cneg - base
    num2 = pos * (2 * neg_before + neg)  # 2 × (concordant + ties/2)
    agg = pd.DataFrame({"source": grp, "num2": num2, "np": pos, "nn": neg}) \
        .groupby("source", as_index=False).sum()
    agg = agg[(agg["np"] > 0) & (agg["nn"] > 0)]
    return pd.DataFrame({
        "source": agg["source"].to_numpy(object),
        "n_pos": agg["np"].to_numpy(np.int64),
        "n_neg": agg["nn"].to_numpy(np.int64),
        "auc": _q6(agg["num2"].to_numpy(np.float64)
                  / (2.0 * agg["np"].to_numpy(np.float64)
                     * agg["nn"].to_numpy(np.float64))),
    })


D_AUC_SQL = """
WITH c AS (
  SELECT source, n_chars AS v,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source, n_chars),
r AS (
  SELECT source, pos, n - pos AS neg,
         CAST(COALESCE(SUM(n - pos) OVER (PARTITION BY source ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS neg_before
  FROM c),
g AS (
  SELECT source,
         CAST(SUM(pos * (2 * neg_before + neg)) AS BIGINT) AS num2,
         CAST(SUM(pos) AS BIGINT) AS np, CAST(SUM(neg) AS BIGINT) AS nn
  FROM r GROUP BY source)
SELECT source, np AS n_pos, nn AS n_neg,
       floor(num2 / (2.0 * np * nn) * 1000000 + 0.5005) / 1000000 AS auc
FROM g WHERE np > 0 AND nn > 0
"""


def t_autocorr(sf_dir: str):
    """Per-user lag-1 autocorrelation of event value in ts order — the
    time-series memory diagnostic (is tomorrow like today?). ONE entity
    shuffle (grouped_map); inside a bucket consecutive-pair extraction
    is a vectorized shift across all the bucket's users at once. Values
    become exact integer cents so the five sufficient statistics
    (Σx Σy Σxy Σxx Σyy) are order-free integers; the Pearson formula
    runs on them in float64 with one 6dp-quantized result. int64 bounds:
    n·Σxx ≤ n²·max_cents² ≈ 2.4e15 per user at 1k events — past that,
    fold per-user in the chunked arbitrary-precision pattern of d_gini.
    Users with <2 pairs or a constant side are dropped on both sides."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"],
               split=True)

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        c = np.floor(g["value"].to_numpy(np.float64)[order] * 100 + 0.5).astype(np.int64)
        same = u[1:] == u[:-1]
        x, y, uid = c[:-1][same], c[1:][same], u[1:][same]
        df = pd.DataFrame({
            "user_id": uid, "n": 1, "sx": x, "sy": y,
            "sxy": x * y, "sxx": x * x, "syy": y * y,
        }).groupby("user_id", as_index=False).sum()
        n = df["n"].to_numpy(np.int64)
        sx, sy = df["sx"].to_numpy(np.int64), df["sy"].to_numpy(np.int64)
        num = n * df["sxy"].to_numpy(np.int64) - sx * sy
        dx = n * df["sxx"].to_numpy(np.int64) - sx * sx
        dy = n * df["syy"].to_numpy(np.int64) - sy * sy
        keep = (n >= 2) & (dx > 0) & (dy > 0)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64)[keep],
            "n_pairs": n[keep],
            "autocorr": _q6(num[keep].astype(np.float64)
                           / np.sqrt(dx[keep].astype(np.float64)
                                     * dy[keep].astype(np.float64))),
        })

    return grouped_map(ds, "user_id", stats)


T_AUTOCORR_SQL = """
WITH v AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
p AS (
  SELECT user_id,
         lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x,
         c AS y
  FROM v),
s AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM p WHERE x IS NOT NULL GROUP BY user_id)
SELECT user_id, n AS n_pairs,
       floor((n * sxy - sx * sy)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS autocorr
FROM s
WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""


def fe_count_encode(sf_dir: str):
    """Frequency (count) encoding of order priority — the leakage-free
    categorical encode for high-cardinality features: each row carries
    its category's global count and relative frequency. Per-batch count
    cells -> one O(categories) exchange -> the tiny map broadcasts back
    through a closure (5 categories; a large vocabulary would ship via
    ray.put like q_broadcast_join). Zero row shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def cells(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
        return pa.table({"p": g["o_orderpriority"], "n": g["count_all"]})

    cnt = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("p").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    total = int(cnt["n"].sum())
    n_map = dict(zip(cnt["p"], cnt["n"].astype(np.int64)))

    def attach(batch: pa.Table) -> pa.Table:
        n = batch["o_orderpriority"].to_pandas().map(n_map).to_numpy(np.int64)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "cat_n": pa.array(n),
            "cat_freq": pa.array(_q6(n.astype(np.float64) / total)),
        })

    return ds.map_batches(attach, batch_format="pyarrow")


FE_COUNT_ENCODE_SQL = """
WITH c AS (SELECT o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders)
SELECT o_orderkey, c.n AS cat_n,
       floor(c.n / CAST(t.total AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS cat_freq
FROM orders JOIN c ON o_orderpriority = c.p CROSS JOIN t
"""


def fe_loo_encode(sf_dir: str):
    """Leave-one-out target encoding of order priority against total
    price — the target-encode variant that excludes the row's own label
    ((Σ_group − own)/(n−1)), killing the single-row leakage of plain
    mean encoding. Targets become exact integer cents so the per-group
    sums are order-free; one O(categories) cell exchange, then the tiny
    (sum, n) map applies per batch. Both engines evaluate the identical
    ((s−c)/100)/(n−1) float expression, 6dp-quantized."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority",
                                          "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        c = np.floor(v.astype(np.float64) * 100 + 0.5)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "p": batch["o_orderpriority"],
            "c": pa.array(c.astype(np.int64)),
        })

    cds = ds.map_batches(cents, batch_format="pyarrow")
    g = (
        cds.groupby("p")
        .aggregate(Sum("c", alias_name="s"), Count(alias_name="n"))
        .to_pandas()
    )
    s_map = dict(zip(g["p"], g["s"].astype(np.int64)))
    n_map = dict(zip(g["p"], g["n"].astype(np.int64)))

    def attach(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_pandas()
        s = p.map(s_map).to_numpy(np.int64)
        n = p.map(n_map).to_numpy(np.int64)
        c = batch["c"].to_numpy()
        keep = n > 1
        loo = ((s[keep] - c[keep]).astype(np.float64) / 100.0) / (n[keep] - 1)
        return pa.table({
            "o_orderkey": pa.array(batch["o_orderkey"].to_numpy()[keep]),
            "loo_mean": pa.array(_q6(loo)),
        })

    return cds.map_batches(attach, batch_format="pyarrow")


FE_LOO_ENCODE_SQL = """
WITH v AS (
  SELECT o_orderkey, o_orderpriority AS p,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders),
g AS (SELECT p, CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY p)
SELECT o_orderkey,
       floor((CAST(g.s - v.c AS DOUBLE) / 100.0) / (g.n - 1)
             * 1000000 + 0.5005) / 1000000 AS loo_mean
FROM v JOIN g USING (p) WHERE g.n > 1
"""


def t_cusum(sf_dir: str):
    """Per-user one-sided CUSUM drift detector over event value — the
    sequential change-point statistic (Page 1954). The recursive
    S_i = max(0, S_{i−1} + x_i − μ) is NOT prefix-expressible, but the
    closed form S_i = P_i − min(0, min_{j≤i} P_j) over the deviation
    prefix sum P is — one entity shuffle, then cumsum + running-min per
    user segment. Everything runs in SCALED integers (dev_i = n·cents_i
    − Σcents, exact in both engines, no float μ), divided back and
    6dp-quantized only in the final per-user statistic. Alarm threshold
    50.0 value-units compares in scaled-int space (> 5000·n), so alarm
    counts are exact. int64 bound: |prefix| ≤ user_events·n·max_cents
    ≈ 5e12 at sf0.1 — beyond ~1e18, per-user rebase (subtract the
    segment's first prefix) or the d_gini chunked fold applies."""
    from ray.data.aggregate import Count, Sum
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"],
               split=True)

    def cents(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        c = np.floor(v.astype(np.float64) * 100 + 0.5)
        return pa.table({
            "user_id": batch["user_id"], "ts": batch["ts"],
            "event_id": batch["event_id"], "c": pa.array(c.astype(np.int64)),
        })

    cds = ds.map_batches(cents, batch_format="pyarrow")
    tot = cds.aggregate(Sum("c", alias_name="s"), Count(alias_name="n"))
    n_total, s_total = int(tot["n"]), int(tot["s"])
    thr = 5000 * n_total  # 50.0 value-units × 100 cents × n scaling

    def cusum(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        dev = n_total * g["c"].to_numpy(np.int64)[order] - s_total
        # per-user prefix sums: global cumsum minus the segment offset
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        cs = np.cumsum(dev)
        starts = np.flatnonzero(new)
        seg_len = np.diff(np.r_[starts, len(u)])
        excl = np.r_[0, cs[:-1]]  # exclusive prefix
        pre = cs - np.repeat(excl[starts], seg_len)
        # per-segment running min (C-level grouped cummin), clipped at 0
        # because P_0 = 0 anchors every user's CUSUM
        run_min = np.minimum(
            pd.Series(pre).groupby(u).cummin().to_numpy(np.int64), 0
        )
        s = pre - run_min
        df = pd.DataFrame({"user_id": u, "s": s, "alarm": (s > thr).astype(np.int64)})
        out = df.groupby("user_id", as_index=False).agg(
            max_s=("s", "max"), n_alarms=("alarm", "sum"))
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(np.int64),
            "max_cusum": _q6(out["max_s"].to_numpy(np.float64) / (100.0 * n_total)),
            "n_alarms": out["n_alarms"].to_numpy(np.int64),
        })

    return grouped_map(cds, "user_id", cusum)


T_CUSUM_SQL = """
WITH t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM events),
d AS (
  SELECT user_id, ts, event_id,
         t.n * CAST(floor(value * 100 + 0.5) AS BIGINT) - t.s AS dev
  FROM events CROSS JOIN t),
p AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(dev) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS pre
  FROM d),
c AS (
  SELECT user_id,
         pre - LEAST(CAST(MIN(pre) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT), 0) AS cus
  FROM p)
SELECT user_id,
       floor(MAX(cus) / (100.0 * (SELECT n FROM t)) * 1000000 + 0.5005)
         / 1000000 AS max_cusum,
       CAST(SUM(CASE WHEN cus > 5000 * (SELECT n FROM t) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarms
FROM c GROUP BY user_id
"""


def q_grouping_sets(sf_dir: str):
    """GROUPING SETS ((priority), (status), (order year)) — three
    independent one-dimensional summaries in ONE streaming pass: the
    finest (priority × status × year) cell table leaves the stream
    once, and every requested set re-aggregates that cell table (like
    q_rollup/q_cube, never a second pass over rows). Revenue sums stay
    exact integer cents until the final /100.0 — one identical IEEE
    division per cell in both engines, no quantizer."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_orderdate",
                        "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        yr = ts.astype("datetime64[Y]").astype(np.int64) + 1970
        c = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table({
            "o_orderpriority": batch["o_orderpriority"],
            "o_orderstatus": batch["o_orderstatus"],
            "o_year": pa.array(yr), "c": pa.array(c),
        })

    fine = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus", "o_year"])
        .aggregate(Count(alias_name="n"), Sum("c", alias_name="c"))
        .to_pandas()
    )
    sets = []
    for dim in ["o_orderpriority", "o_orderstatus", "o_year"]:
        g = fine.groupby(dim, as_index=False)[["n", "c"]].sum()
        for other in ["o_orderpriority", "o_orderstatus", "o_year"]:
            if other != dim:
                g[other] = None
        sets.append(g)
    out = pd.concat(sets, ignore_index=True)
    out["sum_total"] = out["c"].to_numpy(np.int64).astype(np.float64) / 100.0
    out["o_year"] = out["o_year"].astype("float64")  # NULL-able dim
    return out[["o_orderpriority", "o_orderstatus", "o_year", "n", "sum_total"]]


Q_GROUPING_SETS_SQL = """
WITH o AS (
  SELECT o_orderpriority, o_orderstatus,
         CAST(EXTRACT(year FROM o_orderdate) AS DOUBLE) AS o_year,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders)
SELECT o_orderpriority, o_orderstatus, o_year,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c) AS DOUBLE) / 100.0 AS sum_total
FROM o
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), (o_year))
"""


def t_pct_change(sf_dir: str):
    """Per-user percent change of event value vs the previous event —
    the returns transform (pandas pct_change) behind momentum/volatility
    features. One entity shuffle; consecutive-pair extraction is the
    same vectorized shift as t_autocorr. Values become exact integer
    cents so both engines evaluate the single (c−prev)/prev division on
    identical operands, 6dp-quantized. The first event per user (no
    predecessor) is dropped on both sides; cents ≥ 1 so the denominator
    never vanishes, but the guard keeps NULL-div parity anyway."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"],
               split=True)

    def pct(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        c = np.floor(g["value"].to_numpy(np.float64)[order] * 100 + 0.5)
        eid = g["event_id"].to_numpy(np.int64)[order]
        same = (u[1:] == u[:-1]) & (c[:-1] != 0)
        prev, cur = c[:-1][same], c[1:][same]
        return pd.DataFrame({
            "event_id": eid[1:][same],
            "pct_change": _q6((cur - prev) / prev),
        })

    return grouped_map(ds, "user_id", pct)


T_PCT_CHANGE_SQL = """
WITH v AS (
  SELECT user_id, ts, event_id, floor(value * 100 + 0.5) AS c
  FROM events),
p AS (
  SELECT event_id, c,
         lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM v)
SELECT event_id,
       floor((c - prev) / prev * 1000000 + 0.5005) / 1000000 AS pct_change
FROM p WHERE prev IS NOT NULL AND prev <> 0
"""


def d_degree_stats(sf_dir: str):
    """Degree distribution of the supplier–part bipartite graph — the
    first diagnostic before any graph algorithm (hub detection for skew
    planning, cf. the degree-orientation guard in d_triangle_count).
    Three shrinking exchanges: per-batch edge dedup partials -> global
    distinct edge set -> per-supplier degree -> O(distinct degrees)
    histogram. Rows never carry payload columns."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def dedup_part(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_suppkey", "l_partkey"]).aggregate([])

    edges = (
        ds.map_batches(dedup_part, batch_format="pyarrow")
        .groupby(["l_suppkey", "l_partkey"])
        .aggregate(Count(alias_name="_dup"))
        .drop_columns(["_dup"])
    )
    deg = edges.groupby("l_suppkey").aggregate(Count(alias_name="degree"))
    hist = (
        deg.groupby("degree").aggregate(Count(alias_name="n_suppliers"))
        .to_pandas()
        .sort_values("degree")
        .reset_index(drop=True)
    )
    return hist


D_DEGREE_STATS_SQL = """
WITH e AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
d AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS degree FROM e GROUP BY 1)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM d GROUP BY degree ORDER BY degree
"""


def d_calibration(sf_dir: str):
    """Reliability-diagram bins for a length-based relevance score —
    the calibration audit behind every quality classifier: 10 equal-
    width bins over min-max-normalized n_chars, per-bin count, mean
    label (lang='en') and mean normalized score. Pass 1 is a streaming
    global min/max; pass 2 pre-aggregates O(10) bin cells per batch.
    Bin ids and cell sums are pure integer arithmetic ((v−lo)·10 //
    span, clipped to 9), so both engines quantize only the two final
    per-bin divisions."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "documents", columns=["n_chars", "lang"])
    mm = ds.aggregate(Min("n_chars", alias_name="lo"), Max("n_chars", alias_name="hi"))
    lo, hi = int(mm["lo"]), int(mm["hi"])
    span = max(hi - lo, 1)

    def cells(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy()
        b = np.minimum((v - lo) * 10 // span, 9)
        df = pd.DataFrame({
            "bin": b.astype(np.int64),
            "n": 1,
            "pos": (batch["lang"].to_pandas() == "en").astype(np.int64),
            "sv": v.astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("bin", as_index=False).sum(), preserve_index=False
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("pos", alias_name="pos"),
                   Sum("sv", alias_name="sv"))
        .to_pandas()
        .sort_values("bin")
    )
    n = g["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "bin": g["bin"].to_numpy(np.int64),
        "n": n,
        "mean_label": _q6(g["pos"].to_numpy(np.float64) / n),
        "mean_score": _q6((g["sv"].to_numpy(np.int64) - n * lo).astype(np.float64)
                         / (n * span).astype(np.float64)),
    })


D_CALIBRATION_SQL = """
WITH mm AS (SELECT MIN(n_chars) AS lo,
                   GREATEST(MAX(n_chars) - MIN(n_chars), 1) AS span
            FROM documents),
b AS (
  SELECT LEAST(CAST(((n_chars - mm.lo) * 10) // mm.span AS BIGINT), 9) AS bin,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         CAST(n_chars AS BIGINT) AS v
  FROM documents CROSS JOIN mm)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       floor(CAST(SUM(pos) AS DOUBLE) / COUNT(*) * 1000000 + 0.5005)
         / 1000000 AS mean_label,
       floor(CAST(SUM(v) - COUNT(*) * (SELECT lo FROM mm) AS DOUBLE)
             / CAST(COUNT(*) * (SELECT span FROM mm) AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_score
FROM b GROUP BY bin ORDER BY bin
"""


def fe_hinge(sf_dir: str):
    """MARS-style hinge basis expansion of l_quantity at fixed public
    knots (10, 25, 40): max(0, x−c) and max(0, c−x) per knot — the
    piecewise-linear features that let a linear model bend. Row-local,
    zero exchange; subtract+max on the same doubles is bit-exact across
    engines, so nothing is quantized (same float policy as fe_unary)."""
    knots = (10.0, 25.0, 40.0)
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def hinge(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        cols = {
            "l_orderkey": batch["l_orderkey"],
            "l_linenumber": batch["l_linenumber"],
        }
        for k in knots:
            ik = int(k)
            cols[f"h_pos_{ik}"] = pa.array(np.maximum(q - k, 0.0))
            cols[f"h_neg_{ik}"] = pa.array(np.maximum(k - q, 0.0))
        return pa.table(cols)

    return ds.map_batches(hinge, batch_format="pyarrow")


FE_HINGE_SQL = """
SELECT l_orderkey, l_linenumber,
       GREATEST(l_quantity - 10.0, 0.0) AS h_pos_10,
       GREATEST(10.0 - l_quantity, 0.0) AS h_neg_10,
       GREATEST(l_quantity - 25.0, 0.0) AS h_pos_25,
       GREATEST(25.0 - l_quantity, 0.0) AS h_neg_25,
       GREATEST(l_quantity - 40.0, 0.0) AS h_pos_40,
       GREATEST(40.0 - l_quantity, 0.0) AS h_neg_40
FROM lineitem
"""


def d_url_extract(sf_dir: str):
    """URL/domain extraction over web text (the RefinedWeb-style
    domain-frequency audit that feeds blocklist filtering): deterministic
    URL injection (the fixture corpus has none) on doc_id % 3/6/9 —
    including a same-doc duplicate so n_urls > n_docs is exercised —
    then a vectorized regex findall, explode, and per-(domain, doc)
    cell dedup before the tiny per-domain exchange."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        did = batch["doc_id"].to_numpy()
        k = pd.Series((did % 7).astype(str), index=s.index)
        s = s + pd.Series(
            np.where(did % 3 == 0, " http://dom" + k + ".example.com/a", ""),
            index=s.index)
        s = s + np.where(did % 6 == 0, " https://mirror.example.org/p?q=1", "")
        s = s + pd.Series(
            np.where(did % 9 == 0, " http://dom" + k + ".example.com/a", ""),
            index=s.index)
        found = s.str.findall(r"https?://([a-z0-9.-]+)")
        n = found.str.len().to_numpy(np.int64)
        dom = np.concatenate([np.asarray(f, dtype=object) for f in found]) \
            if n.sum() else np.array([], dtype=object)
        df = pd.DataFrame({
            "domain": dom, "doc_id": np.repeat(did, n), "n": 1,
        }).groupby(["domain", "doc_id"], as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["domain", "doc_id"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("domain")
        .aggregate(Count(alias_name="n_docs"), Sum("n", alias_name="n_urls"))
    )


D_URL_EXTRACT_SQL = """
WITH w AS (
  SELECT doc_id,
         COALESCE(text, '')
         || CASE WHEN doc_id % 3 = 0 THEN ' http://dom'
                 || CAST(doc_id % 7 AS VARCHAR) || '.example.com/a'
                 ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN ' https://mirror.example.org/p?q=1' ELSE '' END
         || CASE WHEN doc_id % 9 = 0 THEN ' http://dom'
                 || CAST(doc_id % 7 AS VARCHAR) || '.example.com/a'
                 ELSE '' END AS t
  FROM documents),
u AS (
  SELECT doc_id, unnest(regexp_extract_all(t, 'https?://([a-z0-9.-]+)', 1))
           AS domain
  FROM w),
c AS (SELECT domain, doc_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY domain, doc_id)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_urls
FROM c GROUP BY domain
"""


def d_bloom_fpr(sf_dir: str):
    """Replayable Bloom filter build + probe with exact false-positive
    accounting: customer keys populate a 4096-bit filter through k=3
    public affine hashes mod 2^61−1 (the oracle re-derives every bit),
    then a guaranteed-disjoint probe set (p_partkey + 10,000,019, above
    the fixture id range) measures the realized FPR, and a member
    self-probe asserts the zero-false-negative invariant. The bit set
    is O(m) and broadcasts in a closure; both streams only ship partial
    counters. The primitive under q_bloom_semi_join, here value-audited
    bit by bit."""
    from ray.data.aggregate import Count, Sum

    from ..stages.text import _mulmod61

    M = np.uint64((1 << 61) - 1)
    MBITS = 4096
    HASHES = (
        (np.uint64(1000000007), np.uint64(12345679)),
        (np.uint64(1152921504606846883), np.uint64(987654321987654321)),
        (np.uint64(2305843009213693907), np.uint64(55555555555)),
    )
    OFFSET = 10_000_019

    def positions(ids: np.ndarray) -> list[np.ndarray]:
        out = []
        for a, b in HASHES:
            h = _mulmod61(ids, np.broadcast_to(a, ids.shape)) + b
            h = np.where(h >= M, h - M, h)
            out.append((h % np.uint64(MBITS)).astype(np.int64))
        return out

    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def member_bits(batch: pa.Table) -> pa.Table:
        ids = batch["c_custkey"].to_numpy().astype(np.uint64)
        pos = np.unique(np.concatenate(positions(ids)))
        return pa.table({"pos": pa.array(pos)})

    posdf = (
        cust.map_batches(member_bits, batch_format="pyarrow")
        .groupby("pos").aggregate(Count(alias_name="_dup")).to_pandas()
    )
    bits = np.zeros(MBITS, dtype=bool)
    bits[posdf["pos"].to_numpy(np.int64)] = True
    n_set = int(bits.sum())
    n_members = _table_nrows(sf_dir, "customer")

    def probe_counts(col: str, offset: int):
        def probe(batch: pa.Table) -> pa.Table:
            ids = (batch[col].to_numpy() + offset).astype(np.uint64)
            p1, p2, p3 = positions(ids)
            hit = bits[p1] & bits[p2] & bits[p3]
            return pa.table({
                "n": pa.array([len(ids)], type=pa.int64()),
                "hits": pa.array([int(hit.sum())], type=pa.int64()),
            })
        return probe

    part = _read(sf_dir, "part", columns=["p_partkey"])
    np_agg = part.map_batches(probe_counts("p_partkey", OFFSET),
                              batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n"), Sum("hits", alias_name="hits"))
    nm_agg = cust.map_batches(probe_counts("c_custkey", 0),
                              batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n"), Sum("hits", alias_name="hits"))
    return pd.DataFrame({
        "m_bits": [MBITS], "k": [3], "n_members": [n_members],
        "n_set_bits": [n_set],
        "n_nonmember_probes": [int(np_agg["n"])],
        "n_fp": [int(np_agg["hits"])],
        "fp_rate": [float(_q6(np_agg["hits"] / np_agg["n"]))],
        "n_member_hits": [int(nm_agg["hits"])],
    })


D_BLOOM_FPR_SQL = """
WITH h(a, b) AS (VALUES
  (CAST(1000000007 AS HUGEINT), CAST(12345679 AS HUGEINT)),
  (CAST(1152921504606846883 AS HUGEINT), CAST(987654321987654321 AS HUGEINT)),
  (CAST(2305843009213693907 AS HUGEINT), CAST(55555555555 AS HUGEINT))),
bits AS (
  SELECT DISTINCT CAST(((CAST(c_custkey AS HUGEINT) * h.a + h.b)
           % 2305843009213693951) % 4096 AS BIGINT) AS pos
  FROM customer CROSS JOIN h),
fp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS hits FROM (
    SELECT p_partkey FROM part CROSS JOIN h
    WHERE CAST(((CAST(p_partkey + 10000019 AS HUGEINT) * h.a + h.b)
            % 2305843009213693951) % 4096 AS BIGINT)
          IN (SELECT pos FROM bits)
    GROUP BY p_partkey HAVING COUNT(*) = 3)),
mh AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS hits FROM (
    SELECT c_custkey FROM customer CROSS JOIN h
    WHERE CAST(((CAST(c_custkey AS HUGEINT) * h.a + h.b)
            % 2305843009213693951) % 4096 AS BIGINT)
          IN (SELECT pos FROM bits)
    GROUP BY c_custkey HAVING COUNT(*) = 3))
SELECT 4096 AS m_bits, 3 AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_members,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_set_bits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM part) AS n_nonmember_probes,
       fp.hits AS n_fp,
       floor(fp.hits / (SELECT CAST(COUNT(*) AS DOUBLE) FROM part)
             * 1000000 + 0.5005) / 1000000 AS fp_rate,
       mh.hits AS n_member_hits
FROM fp CROSS JOIN mh
"""


def t_mann_kendall(sf_dir: str):
    """Per-user Mann-Kendall trend statistic S = Σ_{i<j} sign(x_j − x_i)
    in ts order, with Kendall tau-a = S / C(n,2) — the nonparametric
    monotone-trend test (is this user's value drifting?). One entity
    shuffle; values become exact integer cents so every pair sign and
    the pair counts are exact integers, with one quantized division.
    Pairwise work is O(n_u²) per user on the bounded per-entity event
    count (67–700 at fixture scales) — the same per-entity-quadratic
    envelope as the reference's pairwise candidate scoring; a streaming
    Fenwick rank count replaces the outer product if n_u grows
    unbounded."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"],
               split=True)

    def mk(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        c = np.floor(g["value"].to_numpy(np.float64)[order] * 100 + 0.5).astype(
            np.int64)
        rows = []
        starts = np.r_[np.flatnonzero(np.r_[True, u[1:] != u[:-1]]), len(u)]
        for a, b in zip(starts[:-1], starts[1:]):
            n = b - a
            if n < 2:
                continue
            seg = c[a:b]
            diff = np.sign(seg[None, :] - seg[:, None])
            s = int(np.triu(diff, 1).sum())
            pairs = n * (n - 1) // 2
            rows.append((int(u[a]), s, pairs, float(_q6(s / pairs))))
        return pd.DataFrame(rows, columns=["user_id", "mk_s", "n_pairs", "mk_tau"])

    return grouped_map(ds, "user_id", mk)


T_MANN_KENDALL_SQL = """
WITH v AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
p AS (
  SELECT a.user_id, CAST(SIGN(b.c - a.c) AS BIGINT) AS s
  FROM v a JOIN v b
    ON a.user_id = b.user_id
   AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id)))
SELECT user_id, CAST(SUM(s) AS BIGINT) AS mk_s,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       floor(CAST(SUM(s) AS DOUBLE) / COUNT(*) * 1000000 + 0.5005)
         / 1000000 AS mk_tau
FROM p GROUP BY user_id
"""


def t_attribution(sf_dir: str):
    """Last-touch attribution: each purchase event claims the user's
    most recent click strictly before it and within a 7-day lookback —
    the marketing-funnel primitive (same-stream as-of, vs t_asof's
    cross-table form). One entity shuffle; inside a bucket the carried
    last-click is a grouped cummax of click positions shifted by one
    row, so the whole bucket resolves without a per-entity loop.
    Unattributed purchases keep a NULL click id on both sides."""
    from ..stages.temporal import grouped_map

    LOOKBACK_US = 7 * 86_400_000_000

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"], split=True)

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        t = ts[order]
        eid = g["event_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy(object)[order]
        clickpos = np.where(et == "click", np.arange(len(u)), -1)
        carried = pd.Series(clickpos).groupby(u).cummax()
        prev = carried.groupby(u).shift(1).to_numpy()  # strictly-before row
        is_p = et == "purchase"
        j = prev[is_p]
        ok = ~np.isnan(j)
        jj = np.where(ok, j, 0).astype(np.int64)
        ok &= (jj >= 0) & (t[jj] >= t[is_p] - LOOKBACK_US)
        click_id = np.where(ok, eid[jj].astype(np.float64), np.nan)
        return pd.DataFrame({
            "purchase_id": eid[is_p], "click_id": click_id,
        })

    return grouped_map(ds, "user_id", attach)


T_ATTRIBUTION_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER w AS last_click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END
                    IGNORE NULLS) OVER w AS last_click_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT event_id AS purchase_id,
       CAST(CASE WHEN last_click_ts IS NOT NULL
                  AND epoch_us(ts) - epoch_us(last_click_ts)
                      <= 7 * 86400000000
                 THEN last_click_id END AS DOUBLE) AS click_id
FROM o WHERE event_type = 'purchase'
"""


def d_kmv_distinct(sf_dir: str):
    """KMV (bottom-k) distinct-count sketch over part keys — the
    order-statistics sibling of the HLL in q_approx_distinct, with
    PUBLIC replayable randomness: the k=256 smallest distinct values of
    the affine hash mod 2^61−1 travel as tiny per-batch partials, and
    D ≈ (k−1)·M/h_(k). The oracle re-derives the exact same bottom-k
    set, so the ESTIMATE itself is value-verified, not envelope-checked.
    When the stream holds fewer than k distinct hashes the sketch IS
    the exact set (both engines switch to the exact count)."""
    from ..stages.text import _mulmod61

    M = np.uint64((1 << 61) - 1)
    A = np.uint64(1442695040888963407)
    B = np.uint64(6364136223846793005 % ((1 << 61) - 1))
    K = 256

    ds = _read(sf_dir, "lineitem", columns=["l_partkey"])

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = np.unique(batch["l_partkey"].to_numpy()).astype(np.uint64)
        h = _mulmod61(ids, np.broadcast_to(A, ids.shape)) + B
        h = np.where(h >= M, h - M, h)
        h = np.unique(h)[:K]
        return pa.table({"hv": pa.array(h.astype(np.int64))})

    parts = ds.map_batches(bottomk, batch_format="pyarrow").to_pandas()
    hv = np.unique(parts["hv"].to_numpy(np.int64))[:K]
    kk = len(hv)
    hk = int(hv[-1])
    if kk < K:
        est = float(kk)
    else:
        est = (K - 1.0) * (np.float64(int(M)) / np.float64(hk))
    return pd.DataFrame({
        "k": [K], "n_sketch": [kk], "kth_hash": [hk],
        "est_distinct": [float(_q6(est))],
    })


D_KMV_DISTINCT_SQL = """
WITH h AS (
  SELECT DISTINCT CAST((CAST(l_partkey AS HUGEINT) * 1442695040888963407
           + 1752450205419405103) % 2305843009213693951 AS BIGINT) AS hv
  FROM lineitem),
k AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
s AS (SELECT CAST(MAX(hv) AS BIGINT) AS hk, CAST(COUNT(*) AS BIGINT) AS kk
      FROM k)
SELECT 256 AS k, kk AS n_sketch, hk AS kth_hash,
       floor(CASE WHEN kk < 256 THEN CAST(kk AS DOUBLE)
                  ELSE 255.0 * (CAST(2305843009213693951 AS DOUBLE)
                                / CAST(hk AS DOUBLE)) END
             * 1000000 + 0.5005) / 1000000 AS est_distinct
FROM s
"""


def d_ab_ztest(sf_dir: str):
    """Per-source two-proportion z-test of English rate vs the REST of
    the corpus — the A/B-inference primitive behind 'is this shard's
    mix actually different, or noise?' (complements d_wilson_ci's
    single-shard bounds). O(sources) cell exchange of exact (pos, n)
    integers; both engines then evaluate the token-identical pooled-
    variance z expression, 6dp-quantized."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "pos": (batch["lang"].to_pandas() == "en").astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("pos", alias_name="pos"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = g["n"].to_numpy(np.int64)
    pos = g["pos"].to_numpy(np.int64)
    N, P = int(n.sum()), int(pos.sum())
    p1 = pos.astype(np.float64) / n
    p2 = (P - pos).astype(np.float64) / (N - n)
    pp = np.float64(P) / np.float64(N)
    z = (p1 - p2) / np.sqrt(pp * (1.0 - pp) * (1.0 / n + 1.0 / (N - n)))
    return pd.DataFrame({
        "source": g["source"].to_numpy(object),
        "n": n, "pos": pos, "z": _q6(z),
    })


D_AB_ZTEST_SQL = """
WITH c AS (
  SELECT source,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(n) AS BIGINT) AS nn
      FROM c)
SELECT source, n, pos,
       floor((CAST(pos AS DOUBLE) / n
              - CAST(t.p - pos AS DOUBLE) / (t.nn - n))
             / sqrt((CAST(t.p AS DOUBLE) / CAST(t.nn AS DOUBLE))
                    * (1.0 - CAST(t.p AS DOUBLE) / CAST(t.nn AS DOUBLE))
                    * (1.0 / n + 1.0 / (t.nn - n)))
             * 1000000 + 0.5005) / 1000000 AS z
FROM c CROSS JOIN t
"""


def d_gains(sf_dir: str):
    """Cumulative gains / lift table by score decile (price predicting
    returns) — the ranking-eval companion to d_auc that answers 'how
    much of the target does the top 10/20/...% capture?'. Decile edges
    are discrete percentiles selected from one value-count cell
    exchange (elements of the input, so edge assignment is bit-exact);
    per-decile (n, pos) cells then cumulate from the top decile down.
    All counts exact integers; capture and lift are the only quantized
    divisions, token-identical in both engines."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice", "l_returnflag"])

    def vcells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "v": batch["l_extendedprice"].to_numpy(),
            "pos": pc.equal(batch["l_returnflag"], "R").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby("v", as_index=False).sum(), preserve_index=False
        )

    jc = (
        ds.map_batches(vcells, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("pos", alias_name="pos"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("v")
    )
    vals = jc["v"].to_numpy(np.float64)
    cnt = jc["n"].to_numpy(np.int64)
    pos = jc["pos"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    N, P = int(cum[-1]), int(pos.sum())
    # discrete decile edges: smallest value whose cum count ≥ ceil(q·n)
    edges = vals[np.searchsorted(cum, [-(-(k * N) // 10) for k in range(1, 10)])]
    decile = (vals[:, None] > edges[None, :]).sum(axis=1).astype(np.int64)
    g = pd.DataFrame({"decile": decile, "n": cnt, "pos": pos}) \
        .groupby("decile", as_index=False).sum().sort_values("decile",
                                                             ascending=False)
    cum_n = np.cumsum(g["n"].to_numpy(np.int64))
    cum_pos = np.cumsum(g["pos"].to_numpy(np.int64))
    base = np.float64(P) / np.float64(N)
    return pd.DataFrame({
        "decile": g["decile"].to_numpy(np.int64),
        "n": g["n"].to_numpy(np.int64),
        "pos": g["pos"].to_numpy(np.int64),
        "cum_n": cum_n, "cum_pos": cum_pos,
        "capture": _q6(cum_pos.astype(np.float64) / np.float64(P)),
        "lift": _q6((cum_pos.astype(np.float64) / cum_n) / base),
    }).sort_values("decile").reset_index(drop=True)


D_GAINS_SQL = """
WITH e AS (
  SELECT percentile_disc(0.1) WITHIN GROUP (ORDER BY l_extendedprice) AS e1,
         percentile_disc(0.2) WITHIN GROUP (ORDER BY l_extendedprice) AS e2,
         percentile_disc(0.3) WITHIN GROUP (ORDER BY l_extendedprice) AS e3,
         percentile_disc(0.4) WITHIN GROUP (ORDER BY l_extendedprice) AS e4,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS e5,
         percentile_disc(0.6) WITHIN GROUP (ORDER BY l_extendedprice) AS e6,
         percentile_disc(0.7) WITHIN GROUP (ORDER BY l_extendedprice) AS e7,
         percentile_disc(0.8) WITHIN GROUP (ORDER BY l_extendedprice) AS e8,
         percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS e9,
         CAST(COUNT(*) AS BIGINT) AS nn,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS p
  FROM lineitem),
d AS (
  SELECT (l_extendedprice > e.e1)::INT + (l_extendedprice > e.e2)::INT
       + (l_extendedprice > e.e3)::INT + (l_extendedprice > e.e4)::INT
       + (l_extendedprice > e.e5)::INT + (l_extendedprice > e.e6)::INT
       + (l_extendedprice > e.e7)::INT + (l_extendedprice > e.e8)::INT
       + (l_extendedprice > e.e9)::INT AS decile,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
  FROM lineitem CROSS JOIN e),
g AS (SELECT CAST(decile AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS pos
      FROM d GROUP BY decile),
c AS (
  SELECT decile, n, pos,
         CAST(SUM(n) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_n,
         CAST(SUM(pos) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_pos
  FROM g)
SELECT decile, n, pos, cum_n, cum_pos,
       floor(CAST(cum_pos AS DOUBLE) / (SELECT CAST(p AS DOUBLE) FROM e)
             * 1000000 + 0.5005) / 1000000 AS capture,
       floor((CAST(cum_pos AS DOUBLE) / cum_n)
             / ((SELECT CAST(p AS DOUBLE) FROM e)
                / (SELECT CAST(nn AS DOUBLE) FROM e))
             * 1000000 + 0.5005) / 1000000 AS lift
FROM c ORDER BY decile
"""


def q_null_safe_join(sf_dir: str):
    """NULL-safe equality join (IS NOT DISTINCT FROM): deterministic
    NULL injection on both sides (custkey % 500 = 0 — the NULL groups
    stay broadcast-sized by construction), then a broadcast join where
    NULL matches NULL (the Kimball 'unknown member' rollup) — the
    semantics a plain equi-join silently drops. Small side ships as a
    (key → count) map via closure; output is the two-row match summary
    (null-group vs keyed matches) with exact integer cents."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", columns=["c_custkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64)
    null_mask = ck % 500 == 0
    n_null_cust = int(null_mask.sum())
    keyed_counts = pd.Series(ck[~null_mask]).value_counts()
    cnt_map = dict(zip(keyed_counts.index.astype(np.int64),
                       keyed_counts.to_numpy(np.int64)))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def probe(batch: pa.Table) -> pa.Table:
        ok = batch["o_custkey"].to_numpy()
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        o_null = ok % 500 == 0
        m = pd.Series(ok[~o_null]).map(cnt_map).fillna(0).to_numpy(np.int64)
        return pa.table({
            "null_group": pa.array([True, False]),
            "n_pairs": pa.array([int(o_null.sum()) * n_null_cust, int(m.sum())],
                                type=pa.int64()),
            "cents": pa.array(
                [int(cents[o_null].sum()) * n_null_cust,
                 int((cents[~o_null] * m).sum())], type=pa.int64()),
        })

    g = (
        ds.map_batches(probe, batch_format="pyarrow")
        .groupby("null_group")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                   Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("null_group")
    )
    out = pd.DataFrame({
        "null_group": g["null_group"].to_numpy(bool),
        "n_pairs": g["n_pairs"].to_numpy(np.int64),
        "sum_total": g["cents"].to_numpy(np.int64).astype(np.float64) / 100.0,
    })
    # an empty match group produces NO row in SQL (inner join): mirror
    return out[out["n_pairs"] > 0].reset_index(drop=True)


Q_NULL_SAFE_JOIN_SQL = """
WITH o AS (
  SELECT CASE WHEN o_custkey % 500 = 0 THEN NULL ELSE o_custkey END AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
c AS (
  SELECT CASE WHEN c_custkey % 500 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer)
SELECT o.k IS NULL AS null_group,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(o.cents) AS DOUBLE) / 100.0 AS sum_total
FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
GROUP BY o.k IS NULL ORDER BY null_group
"""


def fe_rbf(sf_dir: str):
    """Gaussian RBF basis features of l_quantity at fixed public
    centers (10, 25, 40), γ = 0.005 — the smooth sibling of fe_hinge
    that gives a linear model local bumps. Row-local, zero exchange;
    exp() is the only transcendental, so both engines quantize the
    identical exp(−γ·(x−c)²) doubles at 6dp (same libm-drift policy as
    fe_cyclic)."""
    centers = (10.0, 25.0, 40.0)
    gamma = 0.005
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def rbf(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        cols = {
            "l_orderkey": batch["l_orderkey"],
            "l_linenumber": batch["l_linenumber"],
        }
        for c in centers:
            cols[f"rbf_{int(c)}"] = pa.array(
                _q6(np.exp(-gamma * (q - c) * (q - c))))
        return pa.table(cols)

    return ds.map_batches(rbf, batch_format="pyarrow")


FE_RBF_SQL = """
SELECT l_orderkey, l_linenumber,
       floor(exp(-0.005 * (l_quantity - 10.0) * (l_quantity - 10.0))
             * 1000000 + 0.5005) / 1000000 AS rbf_10,
       floor(exp(-0.005 * (l_quantity - 25.0) * (l_quantity - 25.0))
             * 1000000 + 0.5005) / 1000000 AS rbf_25,
       floor(exp(-0.005 * (l_quantity - 40.0) * (l_quantity - 40.0))
             * 1000000 + 0.5005) / 1000000 AS rbf_40
FROM lineitem
"""


def d_lang_f1(sf_dir: str):
    """Per-language precision/recall/F1 of the stopword language-ID
    classifier against the labeled lang column — the metric layer over
    d_lang_confusion's cells (one O(langs²) exchange, then closed form
    on the tiny table). Precision is NULL for a never-predicted
    language on both sides; F1 is computed FROM the 6dp-quantized
    precision/recall so the engines stay token-identical."""
    from ray.data.aggregate import Sum

    from ..stages.text import language_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def cells(batch: pa.Table) -> pa.Table:
        scored = language_id(batch)
        df = pd.DataFrame({
            "lang": scored["lang"].to_pandas().fillna(""),
            "lang_pred": scored["lang_pred"].to_pandas(),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["lang", "lang_pred"], as_index=False).sum(),
            preserve_index=False,
        )

    conf = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    true_n = conf.groupby("lang")["n"].sum()
    pred_n = conf.groupby("lang_pred")["n"].sum()
    tp = conf[conf["lang"] == conf["lang_pred"]].set_index("lang")["n"]
    rows = []
    for lang in sorted(true_n.index):
        t = int(true_n[lang])
        p = int(pred_n.get(lang, 0))
        h = int(tp.get(lang, 0))
        prec = _q6(h / p) if p > 0 else np.nan
        rec = _q6(h / t)
        f1 = _q6(2.0 * prec * rec / (prec + rec)) \
            if p > 0 and prec + rec > 0 else np.nan
        rows.append((lang, t, p, h, prec, rec, f1))
    return pd.DataFrame(
        rows, columns=["lang", "true_n", "pred_n", "tp", "prec", "rec", "f1"])


D_LANG_F1_SQL = f"""
WITH conf AS ({D_LANG_CONFUSION_SQL}),
t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS true_n,
             CAST(SUM(CASE WHEN lang_pred = lang THEN n ELSE 0 END)
                  AS BIGINT) AS tp
      FROM conf GROUP BY lang),
pr AS (SELECT lang_pred, CAST(SUM(n) AS BIGINT) AS pred_n
       FROM conf GROUP BY lang_pred),
m AS (
  SELECT t.lang, t.true_n, COALESCE(pr.pred_n, 0) AS pred_n, t.tp,
         CASE WHEN COALESCE(pr.pred_n, 0) > 0
              THEN floor(CAST(t.tp AS DOUBLE) / pr.pred_n
                         * 1000000 + 0.5005) / 1000000 END AS prec,
         floor(CAST(t.tp AS DOUBLE) / t.true_n
               * 1000000 + 0.5005) / 1000000 AS rec
  FROM t LEFT JOIN pr ON pr.lang_pred = t.lang)
SELECT lang, true_n, pred_n, tp, prec, rec,
       CASE WHEN prec IS NOT NULL AND prec + rec > 0
            THEN floor(2.0 * prec * rec / (prec + rec)
                       * 1000000 + 0.5005) / 1000000 END AS f1
FROM m ORDER BY lang
"""


def t_dwell_time(sf_dir: str):
    """Per-event-type dwell time: how long users SIT in each state
    (interval from an event to the user's next event, attributed to the
    earlier event's type) — the session-quality aggregate behind
    engagement mixes. One entity shuffle; interval extraction is the
    usual vectorized shift, then exact integer-microsecond sums fold
    through an O(types) cell exchange with one quantized mean."""
    from ray.data.aggregate import Sum
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"], split=True)

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        t = ts[order]
        et = g["event_type"].to_numpy(object)[order]
        same = u[1:] == u[:-1]
        return pd.DataFrame({
            "event_type": et[:-1][same],
            "total_us": t[1:][same] - t[:-1][same],
            "n": 1,
        }).groupby("event_type", as_index=False).sum()

    g = (
        grouped_map(ds, "user_id", intervals)
        .groupby("event_type")
        .aggregate(Sum("total_us", alias_name="total_us"),
                   Sum("n", alias_name="n_intervals"))
        .to_pandas()
        .sort_values("event_type")
    )
    return pd.DataFrame({
        "event_type": g["event_type"].to_numpy(object),
        "total_us": g["total_us"].to_numpy(np.int64),
        "n_intervals": g["n_intervals"].to_numpy(np.int64),
        "mean_us": _q6(g["total_us"].to_numpy(np.float64)
                      / g["n_intervals"].to_numpy(np.float64)),
    })


T_DWELL_TIME_SQL = """
WITH p AS (
  SELECT event_type,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt
  FROM events)
SELECT event_type,
       CAST(SUM(dt) AS BIGINT) AS total_us,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       floor(CAST(SUM(dt) AS DOUBLE) / COUNT(*) * 1000000 + 0.5005)
         / 1000000 AS mean_us
FROM p WHERE dt IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def t_rolling_median(sf_dir: str):
    """Per-user centered rolling MEDIAN (2-preceding/2-following, edges
    clamp like t_rolling_centered) — the holistic windowed aggregate a
    sum/mean rolling can't express, and the robust smoother for spiky
    event values. One entity shuffle, then pandas' C-level grouped
    rolling median per bucket. Values are exact integer cents, and an
    even-count edge window's average-of-middle-two is a dyadic half —
    bit-exact in both engines, no quantizer."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"],
               split=True)

    def med(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        c = np.floor(g["value"].to_numpy(np.float64)[order] * 100 + 0.5)
        eid = g["event_id"].to_numpy(np.int64)[order]
        m = (
            pd.Series(c).groupby(u)
            .rolling(5, center=True, min_periods=1).median()
            .to_numpy()
        )
        return pd.DataFrame({
            "event_id": eid, "roll_median": m / 100.0,
        })

    return grouped_map(ds, "user_id", med)


T_ROLLING_MEDIAN_SQL = """
SELECT event_id,
       median(floor(value * 100 + 0.5))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) / 100.0
         AS roll_median
FROM events
"""


def d_jackknife(sf_dir: str):
    """Leave-one-source-out (block jackknife) means of document length —
    the eval-suite primitive behind 'which shard moves the corpus
    average, and what are the error bars?': per-source LOO mean plus the
    jackknife pseudo-value g·µ − (g−1)·µ₍ᵢ₎ whose variance downstream
    gives the SE. O(sources) cell exchange of exact integers; the LOO
    and overall means are single quantized divisions and the
    pseudo-value is computed FROM the quantized means, keeping both
    engines token-identical (an unquantized float SE would inherit
    sum-order drift)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "s": batch["n_chars"].to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    N, S, G = int(n.sum()), int(s.sum()), len(g)
    mu6 = _q6(np.float64(S) / np.float64(N))
    loo6 = _q6((S - s).astype(np.float64) / (N - n))
    return pd.DataFrame({
        "source": g["source"].to_numpy(object),
        "n": n,
        "loo_mean": loo6,
        "pseudovalue": _q6(G * mu6 - (G - 1) * loo6),
    })


D_JACKKNIFE_SQL = """
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s
  FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS g
      FROM c)
SELECT source, n,
       floor(CAST(t.ss - c.s AS DOUBLE) / (t.nn - c.n)
             * 1000000 + 0.5005) / 1000000 AS loo_mean,
       floor((t.g * (floor(CAST(t.ss AS DOUBLE) / t.nn
                           * 1000000 + 0.5005) / 1000000)
              - (t.g - 1) * (floor(CAST(t.ss - c.s AS DOUBLE) / (t.nn - c.n)
                                   * 1000000 + 0.5005) / 1000000))
             * 1000000 + 0.5005) / 1000000 AS pseudovalue
FROM c CROSS JOIN t
"""


def d_preference_pairs(sf_dir: str):
    """Preference-pair mining (the DPO/RLHF data-construction step):
    per source, pair the highest- against the lowest-scoring document
    (score = n_chars, tie-broken by doc_id) as (chosen, rejected) with
    the score margin. Lexicographic (score, id) extremes travel as ONE
    encoded int64 (score·2³² + id) through ordinary Min/Max partials —
    integer-exact in both engines, no quantizer, O(sources) exchange.
    Encoding bound: score < 2³¹ and id < 2³²."""
    from ray.data.aggregate import Max, Min

    ENC = np.int64(1 << 32)
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def enc(batch: pa.Table) -> pa.Table:
        key = (batch["n_chars"].to_numpy() * ENC
               + batch["doc_id"].to_numpy()).astype(np.int64)
        return pa.table({"source": batch["source"], "key": pa.array(key)})

    g = (
        ds.map_batches(enc, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Max("key", alias_name="mx"), Min("key", alias_name="mn"))
        .to_pandas()
    )
    mx = g["mx"].to_numpy(np.int64)
    mn = g["mn"].to_numpy(np.int64)
    return pd.DataFrame({
        "source": g["source"].to_numpy(object),
        "chosen_doc": mx % (1 << 32),
        "rejected_doc": mn % (1 << 32),
        "chosen_chars": mx // (1 << 32),
        "rejected_chars": mn // (1 << 32),
        "margin": mx // (1 << 32) - mn // (1 << 32),
    })


D_PREFERENCE_PAIRS_SQL = """
WITH e AS (
  SELECT source, n_chars * 4294967296 + doc_id AS key
  FROM documents),
g AS (SELECT source, CAST(MAX(key) AS BIGINT) AS mx,
             CAST(MIN(key) AS BIGINT) AS mn
      FROM e GROUP BY source)
SELECT source,
       mx % 4294967296 AS chosen_doc,
       mn % 4294967296 AS rejected_doc,
       mx // 4294967296 AS chosen_chars,
       mn // 4294967296 AS rejected_chars,
       mx // 4294967296 - mn // 4294967296 AS margin
FROM g
"""


def d_budget_alloc(sf_dir: str):
    """Capped waterfilling token-budget allocation across sources — the
    mixture-planning step behind 'hit B tokens total, proportional to
    weight w_i, but no source can give more than it has': alloc_i =
    min(cap_i, w_i·λ) with Σalloc = B. Caps are the distributed char
    sums; weights are the source's alphabetical ordinal (a deterministic
    skew so the pivot is actually exercised — 12 of 20 fixture sources
    saturate). The pivot is found WITHOUT float comparisons: saturation
    tests cross-multiply exact integers (cap_j·W_rest ≤ w_j·B_rest), so
    both engines pick the identical pivot; λ is then ONE division from
    exact integers and only the unsaturated allocs are quantized.
    Integer bound: cap·Σw < 2⁶³ (HUGEINT/int128 fold past that)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "cap": batch["n_chars"].to_numpy(),
        })
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("cap", alias_name="cap"))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    cap = g["cap"].to_numpy(np.int64)
    w = np.arange(1, len(g) + 1, dtype=np.int64)  # alphabetical ordinal
    B = int(cap.sum()) * 8 // 10
    tot_w = int(w.sum())
    # sort by demand ratio r = cap/w (same single division both engines,
    # source name tie-break)
    r = cap.astype(np.float64) / w
    order = np.lexsort((g["source"].to_numpy(object), r))
    cap_s, w_s = cap[order], w[order]
    cs_cap = np.cumsum(cap_s) - cap_s  # exclusive
    cs_w = np.cumsum(w_s) - w_s
    # row j saturates iff cap_j·(W − cs_w_{j-1}) ≤ w_j·(B − cs_cap_{j-1});
    # first failure ends the saturated prefix (exact integer test)
    flag = cap_s * (tot_w - cs_w) > w_s * (B - cs_cap)
    k = int(np.argmax(flag)) if flag.any() else len(cap)
    w_rest = tot_w - (int(cs_w[k]) if k < len(cap) else tot_w)
    b_rest = B - (int(cs_cap[k]) if k < len(cap) else B)
    lam = np.float64(b_rest) / np.float64(w_rest) if w_rest > 0 else np.float64(0)
    sat = np.zeros(len(cap), dtype=bool)
    sat[order[:k]] = True
    alloc = np.where(sat, cap.astype(np.float64), _q6(w * lam))
    return pd.DataFrame({
        "source": g["source"].to_numpy(object),
        "cap": cap, "w": w, "saturated": sat, "alloc": alloc,
    })


D_BUDGET_ALLOC_SQL = """
WITH c AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS cap
           FROM documents GROUP BY source),
o AS (SELECT source, cap,
             CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS w
      FROM c),
t AS (SELECT CAST(SUM(cap) * 8 // 10 AS BIGINT) AS b,
             CAST(SUM(w) AS BIGINT) AS tw
      FROM o),
s AS (SELECT source, cap, w,
             CAST(COALESCE(SUM(cap) OVER win, 0) AS BIGINT) AS cs_cap,
             CAST(COALESCE(SUM(w) OVER win, 0) AS BIGINT) AS cs_w
      FROM o
      WINDOW win AS (ORDER BY CAST(cap AS DOUBLE) / w, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
f AS (SELECT s.*, cap * (t.tw - cs_w) > w * (t.b - cs_cap) AS stop
      FROM s CROSS JOIN t),
-- the first stop row in ratio order (cs_cap is strictly increasing, so
-- MIN identifies it); its exclusive prefix sums ARE the saturated set's
-- totals. No stop row at all => every source saturates.
k AS (SELECT COUNT(*) > 0 AS has_stop,
             COALESCE(MIN(cs_w), (SELECT tw FROM t)) AS kw,
             COALESCE(MIN(cs_cap), (SELECT b FROM t)) AS kc
      FROM f WHERE stop),
lam AS (SELECT CASE WHEN t.tw - k.kw > 0
                    THEN CAST(t.b - k.kc AS DOUBLE) / (t.tw - k.kw)
                    ELSE 0.0 END AS l
        FROM k CROSS JOIN t)
SELECT f.source, f.cap, f.w,
       (NOT k.has_stop) OR f.cs_cap < k.kc AS saturated,
       CASE WHEN (NOT k.has_stop) OR f.cs_cap < k.kc
            THEN CAST(f.cap AS DOUBLE)
            ELSE floor(f.w * lam.l * 1000000 + 0.5005) / 1000000 END AS alloc
FROM f CROSS JOIN k CROSS JOIN lam
"""


def q_fk_audit(sf_dir: str):
    """Referential-integrity and coverage audit in one pass family:
    orphan lineitems (no parent order), orphan orders (no customer),
    childless orders (no lineitems) and inactive customers (no orders)
    — the warehouse health check run before trusting any join. Parent
    key sets broadcast as sorted arrays with searchsorted probes (at
    scale the Bloom-semi-join path, q_bloom_semi_join, replaces the
    exact set); child presence uses the same machinery reversed."""
    from ray.data.aggregate import Sum

    li_ok = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    ord_keys = _read(sf_dir, "orders", columns=["o_orderkey"]).to_pandas()
    ord_cust = _read(sf_dir, "orders", columns=["o_custkey"]).to_pandas()
    cust_keys = _read(sf_dir, "customer", columns=["c_custkey"]).to_pandas()

    o_sorted = np.sort(ord_keys["o_orderkey"].to_numpy(np.int64))
    c_sorted = np.sort(cust_keys["c_custkey"].to_numpy(np.int64))

    def count_missing(col: str, sorted_keys: np.ndarray):
        def probe(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy()
            idx = np.searchsorted(sorted_keys, v)
            idx_c = np.clip(idx, 0, len(sorted_keys) - 1)
            miss = (idx >= len(sorted_keys)) | (sorted_keys[idx_c] != v)
            return pa.table({"n": pa.array([int(miss.sum())], type=pa.int64())})
        return probe

    li_orphans = int(li_ok.map_batches(count_missing("l_orderkey", o_sorted),
                                       batch_format="pyarrow")
                     .aggregate(Sum("n", alias_name="n"))["n"])
    # distinct child keys via an in-batch dedup partial + key-count-sized
    # exchange (never the raw child column on the driver)
    from ray.data.aggregate import Count

    li_parents = np.sort(
        li_ok.map_batches(
            lambda b: b.group_by(["l_orderkey"]).aggregate([]),
            batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Count(alias_name="_dup"))
        .to_pandas()["l_orderkey"].to_numpy(np.int64))

    def n_not_in(values: np.ndarray, sorted_keys: np.ndarray) -> int:
        if len(sorted_keys) == 0:
            return len(values)
        idx = np.clip(np.searchsorted(sorted_keys, values),
                      0, len(sorted_keys) - 1)
        return int((sorted_keys[idx] != values).sum())

    childless = n_not_in(ord_keys["o_orderkey"].to_numpy(np.int64), li_parents)
    ck = ord_cust["o_custkey"].to_numpy(np.int64)
    ord_orphans = n_not_in(ck, c_sorted)
    inactive = n_not_in(cust_keys["c_custkey"].to_numpy(np.int64),
                        np.unique(ck))
    return pd.DataFrame({
        "check_name": ["customers_inactive", "lineitem_orphans",
                  "orders_childless", "orders_orphans"],
        "n": np.array([inactive, li_orphans, childless, ord_orphans],
                      dtype=np.int64),
    })


Q_FK_AUDIT_SQL = """
SELECT 'customers_inactive' AS check_name,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer WHERE NOT EXISTS
  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'lineitem_orphans',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE NOT EXISTS
  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'orders_childless',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE NOT EXISTS
  (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
UNION ALL
SELECT 'orders_orphans',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE NOT EXISTS
  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
ORDER BY check_name
"""


def d_ece(sf_dir: str):
    """Expected calibration error over d_calibration's 10 reliability
    bins — the single-number audit of the length-based relevance score:
    ECE = Σ_b (n_b/N)·|mean_label_b − mean_score_b|. Per-bin means are
    floored into integer MICRO-units before the gap, so Σ n_b·|Δμ| is an
    exact integer fold and ECE is ONE quantized division — no float
    sum-order drift even across engines."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "documents", columns=["n_chars", "lang"])
    mm = ds.aggregate(Min("n_chars", alias_name="lo"),
                      Max("n_chars", alias_name="hi"))
    lo, hi = int(mm["lo"]), int(mm["hi"])
    span = max(hi - lo, 1)

    def cells(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy()
        b = np.minimum((v - lo) * 10 // span, 9)
        df = pd.DataFrame({
            "bin": b.astype(np.int64), "n": 1,
            "pos": (batch["lang"].to_pandas() == "en").astype(np.int64),
            "sv": v.astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("bin", as_index=False).sum(), preserve_index=False
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("pos", alias_name="pos"),
                   Sum("sv", alias_name="sv"))
        .to_pandas()
    )
    n = g["n"].to_numpy(np.int64)
    label_micro = np.floor(g["pos"].to_numpy(np.float64) / n * 1e6
                           + 0.5005).astype(np.int64)
    score_micro = np.floor((g["sv"].to_numpy(np.int64) - n * lo)
                           .astype(np.float64)
                           / (n * span).astype(np.float64) * 1e6
                           + 0.5005).astype(np.int64)
    total = int(n.sum())
    fold = int((n * np.abs(label_micro - score_micro)).sum())
    return pd.DataFrame({
        "n": [total], "n_bins": [len(g)],
        "ece": [float(_q6(np.float64(fold) / (np.float64(total) * 1e6)))],
    })


D_ECE_SQL = """
WITH mm AS (SELECT MIN(n_chars) AS lo,
                   GREATEST(MAX(n_chars) - MIN(n_chars), 1) AS span
            FROM documents),
b AS (
  SELECT LEAST(CAST(((n_chars - mm.lo) * 10) // mm.span AS BIGINT), 9) AS bin,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         CAST(n_chars AS BIGINT) AS v
  FROM documents CROSS JOIN mm),
g AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS pos,
         CAST(SUM(v) AS BIGINT) AS sv
  FROM b GROUP BY bin),
m AS (
  SELECT n,
         CAST(floor(CAST(pos AS DOUBLE) / n * 1000000 + 0.5005) AS BIGINT)
           AS lm,
         CAST(floor(CAST(sv - n * (SELECT lo FROM mm) AS DOUBLE)
                    / CAST(n * (SELECT span FROM mm) AS DOUBLE)
                    * 1000000 + 0.5005) AS BIGINT) AS sm
  FROM g)
SELECT CAST(SUM(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       floor(CAST(SUM(n * ABS(lm - sm)) AS DOUBLE)
             / (CAST(SUM(n) AS DOUBLE) * 1000000)
             * 1000000 + 0.5005) / 1000000 AS ece
FROM m
"""


def d_label_noise(sf_dir: str):
    """kNN-majority label-error detection (the confident-learning-style
    mislabel audit over the embedding table): every vector's 5 nearest
    neighbors (cosine) vote; a ≥4/5 disagreeing majority flags the row
    as suspect. The corpus matrix broadcasts ONCE via ray.put (f64-
    normalized, ~1 MB at fixture scale — the IVF-bucketed path replaces
    the broadcast when the table outgrows a worker); each batch then
    does one matmul. Rank order uses 6dp floor-quantized scores with a
    vec_id tie-break, so BLAS-vs-sequential dot drift (sub-ulp, absorbed
    by the _q6 bias) cannot flip a neighbor across engines; the majority
    tie-breaks to the smallest label on both sides."""
    import ray

    from ..stages.arrowutil import list_column_matrix

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    pdf = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy(np.int64)
    labels = pdf["label"].to_numpy(np.int64)
    ref = ray.put((Xn, ids, labels))

    def score(batch: pa.Table) -> pa.Table:
        Xn_all, ids_all, lab_all = ray.get(ref)
        q = list_column_matrix(batch["embedding"]).astype(np.float64)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        qid = batch["vec_id"].to_numpy()
        own = batch["label"].to_numpy().astype(np.int64)
        sim = qn @ Xn_all.T
        micro = np.floor(sim * 1e6 + 0.5005).astype(np.int64)
        # composite sort key: quantized score DESC, then vec_id ASC
        key = micro * np.int64(1 << 33) - ids_all[None, :]
        key[np.equal(qid[:, None], ids_all[None, :])] = np.iinfo(np.int64).min
        # keys are unique (id embedded), so an unstable reversed argsort
        # is safe — and negating the int64.min self-sentinel would wrap
        top5 = np.argsort(key, axis=1)[:, -5:][:, ::-1]
        nl = lab_all[top5]  # (n, 5) neighbor labels
        k = int(lab_all.max()) + 1
        counts = np.zeros((len(qid), k), dtype=np.int64)
        for j in range(5):
            np.add.at(counts, (np.arange(len(qid)), nl[:, j]), 1)
        majority = counts.argmax(axis=1)  # ties -> smallest label
        n_agree = counts[np.arange(len(qid)), majority]
        return pa.table({
            "vec_id": batch["vec_id"],
            "own_label": pa.array(own),
            "majority_label": pa.array(majority.astype(np.int64)),
            "n_agree": pa.array(n_agree),
            "suspect": pa.array((majority != own) & (n_agree >= 4)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


D_LABEL_NOISE_SQL = """
WITH s AS (
  SELECT a.vec_id AS qid, a.label AS own, b.vec_id AS nid, b.label AS nl,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY CAST(floor(list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                      * 1000000 + 0.5005) AS BIGINT) DESC,
                    b.vec_id) AS rnk
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
t AS (SELECT qid, own, nl, CAST(COUNT(*) AS BIGINT) AS c
      FROM s WHERE rnk <= 5 GROUP BY qid, own, nl),
m AS (SELECT qid, own, nl, c,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, nl) AS r
      FROM t)
SELECT qid AS vec_id, CAST(own AS BIGINT) AS own_label,
       CAST(nl AS BIGINT) AS majority_label, c AS n_agree,
       nl <> own AND c >= 4 AS suspect
FROM m WHERE r = 1
"""


def d_hard_negative(sf_dir: str):
    """Contrastive hard-example mining for the first 10 query vectors:
    the most-similar vector with a DIFFERENT label (hard negative — the
    pair a contrastive loss learns most from) and with the SAME label
    (hard positive), by quantized cosine with vec_id tie-break. Same
    broadcast-matrix + per-batch matmul shape as d_label_noise, filtered
    to 10 probe rows; scores ship as the exact micro-integers both
    engines derived."""
    import ray

    from ..stages.arrowutil import list_column_matrix

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    pdf = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy(np.int64)
    labels = pdf["label"].to_numpy(np.int64)
    ref = ray.put((Xn, ids, labels))

    probes = ds.filter(expr="vec_id < 10")

    def mine(batch: pa.Table) -> pa.Table:
        Xn_all, ids_all, lab_all = ray.get(ref)
        q = list_column_matrix(batch["embedding"]).astype(np.float64)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        qid = batch["vec_id"].to_numpy()
        own = batch["label"].to_numpy().astype(np.int64)
        micro = np.floor((qn @ Xn_all.T) * 1e6 + 0.5005).astype(np.int64)
        key = micro * np.int64(1 << 33) - ids_all[None, :]
        self_mask = np.equal(qid[:, None], ids_all[None, :])
        same = np.equal(own[:, None], lab_all[None, :]) & ~self_mask
        diff = ~np.equal(own[:, None], lab_all[None, :])
        kneg = np.where(diff, key, np.iinfo(np.int64).min)
        kpos = np.where(same, key, np.iinfo(np.int64).min)
        jn, jp = kneg.argmax(axis=1), kpos.argmax(axis=1)
        return pa.table({
            "query_id": batch["vec_id"],
            "own_label": pa.array(own),
            "hard_neg_id": pa.array(ids_all[jn]),
            "hard_neg_micro": pa.array(micro[np.arange(len(qid)), jn]),
            "hard_pos_id": pa.array(ids_all[jp]),
            "hard_pos_micro": pa.array(micro[np.arange(len(qid)), jp]),
        })

    return probes.map_batches(mine, batch_format="pyarrow")


D_HARD_NEGATIVE_SQL = """
WITH p AS (
  SELECT a.vec_id AS qid, a.label AS own, b.vec_id AS nid, b.label AS nl,
         CAST(floor(list_cosine_similarity(
                a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                * 1000000 + 0.5005) AS BIGINT) AS micro
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) a
  JOIN embeddings b ON a.vec_id <> b.vec_id),
neg AS (SELECT qid, nid, micro,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY micro DESC, nid) AS r
        FROM p WHERE nl <> own),
pos AS (SELECT qid, nid, micro,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY micro DESC, nid) AS r
        FROM p WHERE nl = own),
o AS (SELECT DISTINCT qid, own FROM p)
SELECT o.qid AS query_id, CAST(o.own AS BIGINT) AS own_label,
       neg.nid AS hard_neg_id, neg.micro AS hard_neg_micro,
       pos.nid AS hard_pos_id, pos.micro AS hard_pos_micro
FROM o JOIN neg ON neg.qid = o.qid AND neg.r = 1
       JOIN pos ON pos.qid = o.qid AND pos.r = 1
"""


def q_join_size_est(sf_dir: str):
    """Exact join-cardinality computation WITHOUT running the join — the
    optimizer primitive |A⋈B| = Σ_k cntA(k)·cntB(k): per-batch key-count
    partials on both inputs, two key-cardinality exchanges, one tiny
    merge. Also reports both distinct-key counts and the max per-key
    product (the skew planner's worst bucket). Everything is exact
    integers; no quantizer."""
    from ray.data.aggregate import Sum

    def key_counts(table: str, col: str):
        ds = _read(sf_dir, table, columns=[col])

        def cells(batch: pa.Table) -> pa.Table:
            g = batch.group_by([col]).aggregate([([], "count_all")])
            return pa.table({"k": g[col], "n": g["count_all"]})

        return (
            ds.map_batches(cells, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("n", alias_name="n")).to_pandas()
        )

    a = key_counts("orders", "o_custkey")
    b = key_counts("customer", "c_custkey")
    m = a.merge(b, on="k", suffixes=("_a", "_b"))
    prod = m["n_a"].to_numpy(np.int64) * m["n_b"].to_numpy(np.int64)
    return pd.DataFrame({
        "join_rows": [int(prod.sum())],
        "distinct_a": [len(a)], "distinct_b": [len(b)],
        "matched_keys": [len(m)],
        "max_key_product": [int(prod.max()) if len(m) else 0],
    })


Q_JOIN_SIZE_EST_SQL = """
WITH a AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1),
b AS (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1)
SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS join_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS distinct_a,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS distinct_b,
       CAST(COUNT(*) AS BIGINT) AS matched_keys,
       CAST(MAX(a.n * b.n) AS BIGINT) AS max_key_product
FROM a JOIN b USING (k)
"""


def t_peak_detect(sf_dir: str):
    """Per-user local-maximum count (strict peaks: higher than both
    neighbors in ts order) plus the global peak value — the spike
    census before alert tuning. One entity shuffle; peak tests compare
    exact integer cents via vectorized shifts, so counts are exact and
    only nothing is quantized (max is an element)."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"],
               split=True)

    def peaks(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((g["event_id"].to_numpy(), ts, g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy(np.int64)[order]
        c = np.floor(g["value"].to_numpy(np.float64)[order] * 100 + 0.5).astype(
            np.int64)
        same_prev = np.r_[False, u[1:] == u[:-1]]
        same_next = np.r_[u[1:] == u[:-1], False]
        higher_prev = np.r_[False, c[1:] > c[:-1]]
        higher_next = np.r_[c[:-1] > c[1:], False]
        is_peak = same_prev & same_next & higher_prev & higher_next
        df = pd.DataFrame({"user_id": u, "p": is_peak.astype(np.int64),
                           "pc": np.where(is_peak, c, np.int64(-1))})
        out = df.groupby("user_id", as_index=False).agg(
            n_peaks=("p", "sum"), mx=("pc", "max"))
        out["max_peak"] = np.where(out["n_peaks"] > 0,
                                   out["mx"] / 100.0, np.nan)
        return out[["user_id", "n_peaks", "max_peak"]]

    return grouped_map(ds, "user_id", peaks)


T_PEAK_DETECT_SQL = """
WITH v AS (
  SELECT user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         lag(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS pc,
         lead(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS nc
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE pc IS NOT NULL AND nc IS NOT NULL
                               AND c > pc AND c > nc) AS BIGINT) AS n_peaks,
       MAX(CASE WHEN pc IS NOT NULL AND nc IS NOT NULL
                 AND c > pc AND c > nc THEN c END) / 100.0 AS max_peak
FROM v GROUP BY user_id
"""


def t_streak(sf_dir: str):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands query (day − dense_rank is constant within an
    island). One entity shuffle; per bucket the distinct (user, day)
    grid sorts once and island lengths fall out of run-length encoding
    over exact integer day ordinals."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts"], split=True)

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        days = (g["ts"].to_numpy("datetime64[us]").astype(np.int64)
                // 86_400_000_000)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64), "d": days}) \
            .drop_duplicates().sort_values(["u", "d"])
        u = df["u"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        # island starts: new user OR a gap > 1 day
        new = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)]
        island = np.cumsum(new) - 1
        lengths = np.bincount(island)
        iu = u[np.r_[np.flatnonzero(new)]]
        return pd.DataFrame({"u": iu, "len": lengths}) \
            .groupby("u", as_index=False) \
            .agg(longest_streak=("len", "max"), n_streaks=("len", "size")) \
            .rename(columns={"u": "user_id"})

    return grouped_map(ds, "user_id", streaks)


T_STREAK_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events),
i AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS BIGINT) AS island
  FROM d),
s AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
      FROM i GROUP BY user_id, island)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM s GROUP BY user_id
"""


def q_except_all(sf_dir: str):
    """EXCEPT ALL (bag difference, multiplicity-aware): urgent-priority
    order keys minus shipped lineitem order keys WITH multiplicity —
    the multiset semantics q_except's DISTINCT variant can't express
    (a key appearing 3−1 times keeps 2 copies). Per-side key-count
    cells, one merged exchange, surviving multiplicity = max(nA−nB, 0);
    output stays cell-sized (key, n_copies). Exact integers."""
    from ray.data.aggregate import Sum

    def counts(table: str, col: str, columns=None, where=None):
        ds = _read(sf_dir, table, columns=columns or [col], where=where)

        def cells(batch: pa.Table) -> pa.Table:
            g = batch.group_by([col]).aggregate([([], "count_all")])
            return pa.table({"k": g[col], "n": g["count_all"]})

        return (
            ds.map_batches(cells, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("n", alias_name="n")).to_pandas()
        )

    a = counts("orders", "o_orderkey",
               columns=["o_orderkey", "o_orderpriority"],
               where=pc.field("o_orderpriority") == "1-URGENT")
    b = counts("lineitem", "l_orderkey")
    m = a.merge(b, on="k", how="left", suffixes=("_a", "_b")).fillna({"n_b": 0})
    keep = (m["n_a"].to_numpy(np.int64)
            - m["n_b"].to_numpy(np.int64))
    mask = keep > 0
    return pd.DataFrame({
        "o_orderkey": m["k"].to_numpy(np.int64)[mask],
        "n_copies": keep[mask],
    }).sort_values("o_orderkey").reset_index(drop=True)


Q_EXCEPT_ALL_SQL = """
WITH a AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n
           FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
b AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1)
SELECT a.k AS o_orderkey, a.n - COALESCE(b.n, 0) AS n_copies
FROM a LEFT JOIN b USING (k)
WHERE a.n - COALESCE(b.n, 0) > 0
ORDER BY o_orderkey
"""


def d_theil(sf_dir: str):
    """Per-source Theil-T inequality index of document length —
    the decomposable entropy-based companion to d_gini (Theil splits
    into within/between-source terms; Gini doesn't). One (source,
    n_chars) value-cell exchange; each distinct value's (v/µ)·ln(v/µ)
    term is floored into integer MICRO-units from the identical float
    expression, so the weighted fold Σ n_v·term is an exact integer and
    the index is ONE quantized division — no float sum-order drift over
    the value cells."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "v": batch["n_chars"].to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    g = jc.groupby("source")
    sums = g.apply(lambda d: pd.Series({
        "N": int(d["n"].sum()),
        "S": int((d["n"] * d["v"]).sum()),
    }), include_groups=False)
    rows = []
    for src, d in g:
        N, S = int(sums.loc[src, "N"]), int(sums.loc[src, "S"])
        mu = np.float64(S) / np.float64(N)  # one division, identical
        r = d["v"].to_numpy(np.float64) / mu
        term_micro = np.floor(r * np.log(r) * 1e6 + 0.5005).astype(np.int64)
        fold = int((d["n"].to_numpy(np.int64) * term_micro).sum())
        rows.append((src, N,
                     float(_q6(np.float64(fold) / (np.float64(N) * 1e6)))))
    return pd.DataFrame(rows, columns=["source", "n", "theil_t"]) \
        .sort_values("source").reset_index(drop=True)


D_THEIL_SQL = """
WITH c AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source, n_chars),
t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(n * v) AS BIGINT) AS ss
      FROM c GROUP BY source),
m AS (
  SELECT c.source, c.n,
         CAST(floor((c.v / (CAST(t.ss AS DOUBLE) / t.nn))
                    * ln(c.v / (CAST(t.ss AS DOUBLE) / t.nn))
                    * 1000000 + 0.5005) AS BIGINT) AS term
  FROM c JOIN t USING (source))
SELECT m.source, t.nn AS n,
       floor(CAST(SUM(m.n * m.term) AS DOUBLE)
             / (CAST(t.nn AS DOUBLE) * 1000000)
             * 1000000 + 0.5005) / 1000000 AS theil_t
FROM m JOIN t USING (source)
GROUP BY m.source, t.nn ORDER BY m.source
"""


def d_mix_entropy(sf_dir: str):
    """Shannon entropy (nats) of the corpus's source mixture plus its
    normalized evenness H/ln(G) — the one-number diversity audit of a
    data recipe. O(sources) exact count cells; each −p·ln(p) term
    floors into integer micro-units from the identical float expression
    (same exact-fold pattern as d_theil), one quantized division."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source"])

    def cells(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "n": g["count_all"]})

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    n = g["n"].to_numpy(np.int64)
    N, G = int(n.sum()), len(g)
    p = n.astype(np.float64) / np.float64(N)
    term_micro = np.floor(-p * np.log(p) * 1e6 + 0.5005).astype(np.int64)
    fold = int(term_micro.sum())
    h = _q6(np.float64(fold) / 1e6)
    return pd.DataFrame({
        "n_sources": [G], "n_docs": [N], "entropy": [float(h)],
        "evenness": [float(_q6(h / np.log(np.float64(G))))],
    })


D_MIX_ENTROPY_SQL = """
WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS g
      FROM c),
m AS (
  SELECT CAST(floor(-(c.n / CAST(t.nn AS DOUBLE))
                    * ln(c.n / CAST(t.nn AS DOUBLE))
                    * 1000000 + 0.5005) AS BIGINT) AS term
  FROM c CROSS JOIN t),
h AS (SELECT floor(CAST(SUM(term) AS DOUBLE) / 1000000
                   * 1000000 + 0.5005) / 1000000 AS entropy
      FROM m)
SELECT t.g AS n_sources, t.nn AS n_docs, h.entropy,
       floor(h.entropy / ln(CAST(t.g AS DOUBLE)) * 1000000 + 0.5005)
         / 1000000 AS evenness
FROM h CROSS JOIN t
"""


def t_time_to_event(sf_dir: str):
    """Per-user time-to-conversion: microseconds from the user's FIRST
    signup to their FIRST purchase at-or-after it, with a censored flag
    when no purchase follows — the survival-analysis label builder. One
    entity shuffle; first-occurrence extraction is a grouped min over
    exact integer timestamps, the censor is a NULL duration on both
    sides. Users who never sign up are absent from both engines."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"],
               split=True)

    def tte(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        df = pd.DataFrame({"u": u, "t": us, "et": et})
        signup = df[df["et"] == "signup"].groupby("u")["t"].min()
        pur = df[df["et"] == "purchase"]
        out = signup.rename("t0").reset_index()
        m = pur.merge(out, on="u")
        first_after = m[m["t"] >= m["t0"]].groupby("u")["t"].min()
        dur = (first_after - signup).reindex(signup.index)
        return pd.DataFrame({
            "user_id": signup.index.to_numpy(np.int64),
            "duration_us": dur.to_numpy(np.float64),
            "censored": dur.isna().to_numpy(),
        })

    return grouped_map(ds, "user_id", tte)


T_TIME_TO_EVENT_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT s.user_id, MIN(epoch_us(e.ts)) AS t1
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t0
      GROUP BY s.user_id)
SELECT s.user_id,
       CAST(p.t1 - s.t0 AS DOUBLE) AS duration_us,
       p.t1 IS NULL AS censored
FROM s LEFT JOIN p USING (user_id)
"""


def t_km(sf_dir: str):
    """Kaplan-Meier survival curve over signup→purchase conversion:
    per-user (duration, event) labels reduce through ONE entity shuffle
    (censored users get observation-end minus signup, so every subject
    carries an exact integer duration); the curve itself is
    O(distinct event times). Each step's ln((n−d)/n) factor floors into
    integer micro-units from the identical float expression, the
    cumulative hazard is an exact integer sum, and survival is one
    quantized exp — the d_theil exact-fold pattern in ln-space. A step
    where the whole risk set converts (d == n) zeroes the curve from
    that time on (ln(0) never evaluates on either engine). At 100 TB
    the driver sees O(users) 17-byte labels; bucket durations first if
    even that is too wide."""
    u = _surv_labels(sf_dir)
    durs = np.sort(u["dur"].to_numpy(np.int64))
    N = len(durs)
    ev_durs = u.loc[u["ev"], "dur"].to_numpy(np.int64)
    tt, d = np.unique(ev_durs, return_counts=True)
    n = N - np.searchsorted(durs, tt, side="left")
    alive = d < n
    term = np.zeros(len(tt), np.int64)
    term[alive] = np.floor(
        np.log((n[alive] - d[alive]) / n[alive].astype(np.float64)) * 1e6
        + 0.5005
    ).astype(np.int64)
    cum = np.cumsum(term)
    dead = np.cumsum(~alive) > 0  # any d==n step at or before this one
    surv = np.where(dead, 0.0, _q6(np.exp(cum / 1e6)))
    return pd.DataFrame({
        "duration_us": tt, "n_risk": n, "d_events": d, "survival": surv,
    })


T_KM_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT s.user_id, MIN(epoch_us(e.ts)) AS t1
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t0
      GROUP BY s.user_id),
u AS (SELECT s.user_id,
             COALESCE(p.t1, (SELECT MAX(epoch_us(ts)) FROM events)) - s.t0
               AS dur,
             p.t1 IS NOT NULL AS ev
      FROM s LEFT JOIN p USING (user_id)),
t AS (SELECT dur AS tt, CAST(COUNT(*) AS BIGINT) AS d
      FROM u WHERE ev GROUP BY dur),
r AS (SELECT t.tt, t.d,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM u WHERE u.dur >= t.tt)
               AS n
      FROM t),
k AS (SELECT tt, d, n,
        SUM(CASE WHEN d < n THEN
              CAST(floor(ln((n - d) / CAST(n AS DOUBLE)) * 1000000
                         + 0.5005) AS BIGINT)
            ELSE 0 END) OVER (ORDER BY tt) AS cum,
        MAX(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER (ORDER BY tt) AS dead
      FROM r)
SELECT tt AS duration_us, n AS n_risk, d AS d_events,
       CASE WHEN dead = 1 THEN 0.0
            ELSE floor(exp(CAST(cum AS DOUBLE) / 1000000) * 1000000
                       + 0.5005) / 1000000 END AS survival
FROM k ORDER BY tt
"""


def q_weighted_median(sf_dir: str):
    """Grouped WEIGHTED median: per (returnflag, linestatus), the
    smallest price (exact integer cents) whose cumulative quantity
    weight reaches half the group's total — the robust center a plain
    median misses when row weights differ. One (group, value)
    weight-cell exchange; the pick is pure integer comparisons
    (2·cumw ≥ W), no quantizer anywhere."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                        "l_quantity"])

    def cells(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        w = batch["l_quantity"].to_numpy().astype(np.int64)
        df = pd.DataFrame({
            "f": batch["l_returnflag"].to_pandas(),
            "s": batch["l_linestatus"].to_pandas(), "v": v, "w": w,
        })
        return pa.Table.from_pandas(
            df.groupby(["f", "s", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    # per-batch partials + a driver pandas fold: price cents are
    # near-unique, so a generic 3-column Ray groupby shuffles ~every
    # row (8-10s at sf0.1 where this path takes ~2)
    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["f", "s", "v"], as_index=False)["w"].sum()
        .sort_values(["f", "s", "v"])
    )
    rows = []
    for (f, s), g in jc.groupby(["f", "s"]):
        w = g["w"].to_numpy(np.int64)
        W = int(w.sum())
        cw = np.cumsum(w)
        pick = int(g["v"].to_numpy(np.int64)[np.argmax(2 * cw >= W)])
        rows.append((f, s, W, pick))
    return pd.DataFrame(
        rows,
        columns=["l_returnflag", "l_linestatus", "total_qty",
                 "wmedian_cents"],
    ).sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q_WEIGHTED_MEDIAN_SQL = """
WITH c AS (
  SELECT l_returnflag AS f, l_linestatus AS s,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2, 3),
t AS (SELECT f, s, CAST(SUM(w) AS BIGINT) AS total FROM c GROUP BY f, s),
r AS (SELECT c.f, c.s, c.v, t.total,
             CAST(SUM(c.w) OVER (PARTITION BY c.f, c.s ORDER BY c.v)
                  AS BIGINT) AS cw
      FROM c JOIN t USING (f, s))
SELECT f AS l_returnflag, s AS l_linestatus, total AS total_qty,
       MIN(CASE WHEN 2 * cw >= total THEN v END) AS wmedian_cents
FROM r GROUP BY f, s, total ORDER BY 1, 2
"""


def d_containment(sf_dir: str):
    """Exact word-3-gram CONTAINMENT for the adjacent-pair convention
    (doc_id % 50 == 0 paired with +1): |A∩B|/|A| and |A∩B|/|B| — the
    asymmetric signal that catches a document swallowed whole by a
    longer one, where Jaccard is diluted by the size gap (the reason
    suffix-array dedup pipelines report containment, not Jaccard).
    Same grouped_map co-location as d_jaccard; a <3-word side is
    vacuously contained (1.0)."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        mask = (ids % 50 == 0) | (ids % 50 == 1)
        t = batch.filter(pa.array(mask))
        return t.append_column("pair_id",
                               pa.array(t["doc_id"].to_numpy() // 50))

    def grams(t: str):
        ws = (t or "").split()
        return {tuple(ws[i:i + 3]) for i in range(len(ws) - 2)}

    def pair_contain(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("pair_id", sort=False):
            if len(grp) != 2:
                continue
            grp = grp.sort_values("doc_id")
            a, b = grp.iloc[0], grp.iloc[1]
            if b["doc_id"] != a["doc_id"] + 1:
                continue
            ga, gb = grams(a["text"]), grams(b["text"])
            inter = len(ga & gb)
            a_in_b = 1.0 if not ga else float(_q6(inter / len(ga)))
            b_in_a = 1.0 if not gb else float(_q6(inter / len(gb)))
            out.append((a["doc_id"], b["doc_id"], a_in_b, b_in_a))
        return pd.DataFrame(out, columns=["a_id", "b_id", "a_in_b", "b_in_a"])

    picked = ds.map_batches(pick, batch_format="pyarrow")
    return grouped_map(picked, "pair_id", pair_contain)


D_CONTAINMENT_SQL = """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS w
  FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.w AS wa, b.w AS wb
  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 50 = 0
), g AS (
  SELECT a_id, b_id,
    list_distinct(list_transform(generate_series(1, greatest(len(wa) - 2, 0)),
        i -> wa[i] || ' ' || wa[i+1] || ' ' || wa[i+2])) AS ga,
    list_distinct(list_transform(generate_series(1, greatest(len(wb) - 2, 0)),
        i -> wb[i] || ' ' || wb[i+1] || ' ' || wb[i+2])) AS gb
  FROM pairs
)
SELECT a_id, b_id,
  CASE WHEN len(ga) = 0 THEN 1.0
       ELSE floor(len(list_intersect(ga, gb))
                  / CAST(len(ga) AS DOUBLE) * 1000000 + 0.5005) / 1000000
  END AS a_in_b,
  CASE WHEN len(gb) = 0 THEN 1.0
       ELSE floor(len(list_intersect(ga, gb))
                  / CAST(len(gb) AS DOUBLE) * 1000000 + 0.5005) / 1000000
  END AS b_in_a
FROM g ORDER BY a_id
"""


def q_interval_join(sf_dir: str):
    """Interval-OVERLAP self-join: each order becomes the interval
    [orderdate, last shipdate] (end from a per-order Max cell
    exchange; the order dimension — key, customer, start — attaches
    via the size-thresholded `auto_join` planner: under
    BROADCAST_MAX_ROWS the orders side ships ONCE as one ray.put and
    probes zero-shuffle, above it the planner flips to the bucketed
    shuffle_hash_join — orders is a FACT table, so at 100 TB the
    shuffle path engages automatically instead of a driver-side
    materialization), then pairs of the SAME customer whose intervals
    overlap are emitted with the exact overlap in microseconds. Pair
    enumeration is one vectorized self-merge per grouped_map bucket
    (k≤ a few dozen orders → k² tiny per entity). The overlap
    predicate is the symmetric a.start≤b.end ∧ b.start≤a.end — a
    range-band join neither equi- nor as-of joins express."""
    from ray.data.aggregate import Max

    from ..stages.partition import auto_join
    from ..stages.temporal import grouped_map

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def endcells(batch: pa.Table) -> pa.Table:
        e = batch["l_shipdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        df = pd.DataFrame({"l_orderkey": batch["l_orderkey"].to_numpy(),
                           "e_us": e})
        return pa.Table.from_pandas(
            df.groupby("l_orderkey", as_index=False).max(),
            preserve_index=False,
        )

    ends = (
        li.map_batches(endcells, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Max("e_us", alias_name="e_us"))
    )
    orders_ds = _read(sf_dir, "orders",
                      columns=["o_orderkey", "o_custkey", "o_orderdate"])
    joined = auto_join(
        ends, orders_ds, left_on="l_orderkey", right_on="o_orderkey",
        # known statically: .schema() on the aggregate lineage would
        # execute the whole upstream shuffle once, then the probe again
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("e_us", pa.int64())]),
    )

    def to_interval(batch: pa.Table) -> pa.Table:
        s_us = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "o_orderkey": batch["l_orderkey"],
            "o_custkey": batch["o_custkey"],
            "s_us": pa.array(s_us),
            "e_us": batch["e_us"],
        })

    iv = joined.map_batches(to_interval, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized self-merge per bucket (a Python loop over
        # customers cost several seconds at sf0.1); a<b and the
        # overlap predicate filter the k² blowup per customer
        k = g[["o_custkey", "o_orderkey", "s_us", "e_us"]]
        m = k.merge(k, on="o_custkey", suffixes=("_a", "_b"))
        m = m[(m["o_orderkey_a"] < m["o_orderkey_b"])
              & (m["s_us_a"] <= m["e_us_b"])
              & (m["s_us_b"] <= m["e_us_a"])]
        return pd.DataFrame({
            "o_custkey": m["o_custkey"].to_numpy(np.int64),
            "a_key": m["o_orderkey_a"].to_numpy(np.int64),
            "b_key": m["o_orderkey_b"].to_numpy(np.int64),
            "overlap_us": (np.minimum(m["e_us_a"], m["e_us_b"])
                           - np.maximum(m["s_us_a"], m["s_us_b"]))
            .to_numpy(np.int64),
        })

    return grouped_map(iv, "o_custkey", pairs)


Q_INTERVAL_JOIN_SQL = """
WITH e AS (SELECT l_orderkey AS okey, MAX(epoch_us(l_shipdate)) AS e_us
           FROM lineitem GROUP BY 1),
i AS (SELECT o.o_orderkey AS okey, o.o_custkey AS cust,
             epoch_us(o.o_orderdate) AS s_us, e.e_us
      FROM orders o JOIN e ON e.okey = o.o_orderkey)
SELECT a.cust AS o_custkey, a.okey AS a_key, b.okey AS b_key,
       least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
FROM i a JOIN i b
  ON a.cust = b.cust AND a.okey < b.okey
 AND a.s_us <= b.e_us AND b.s_us <= a.e_us
ORDER BY 1, 2, 3
"""


def d_kmv_setops(sf_dir: str):
    """KMV set-operation estimates across two streams: distinct part
    keys among high-quantity (≥25) vs low-quantity lineitems, with
    |A|, |B|, |A∪B| and |A∩B| all estimated from bottom-256 sketches
    under the SAME public affine hash mod 2^61−1 as d_kmv_distinct —
    so the union sketch is the bottom-k of the merged k-sets (a value
    in the union's bottom-k is necessarily in its side's bottom-k) and
    the intersection uses the Beyer et al. ratio ρ = |union-k ∩ A-k ∩
    B-k| / k_u. Replayable randomness makes every register AND every
    estimate value-verified by the oracle, not envelope-checked. Only
    K-sized partials leave each batch."""
    from ..stages.text import _mulmod61

    M = np.uint64((1 << 61) - 1)
    A = np.uint64(1442695040888963407)
    B = np.uint64(6364136223846793005 % ((1 << 61) - 1))
    K = 256

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = np.unique(batch["l_partkey"].to_numpy()).astype(np.uint64)
        h = _mulmod61(ids, np.broadcast_to(A, ids.shape)) + B
        h = np.where(h >= M, h - M, h)
        return pa.table({"hv": pa.array(np.unique(h)[:K].astype(np.int64))})

    def sketch(where):
        ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"],
                   where=where).select_columns(["l_partkey"])
        parts = ds.map_batches(bottomk, batch_format="pyarrow").to_pandas()
        return np.unique(parts["hv"].to_numpy(np.int64))[:K]

    ha = sketch(pc.field("l_quantity") >= 25.0)
    hb = sketch(pc.field("l_quantity") < 25.0)
    un = np.unique(np.concatenate([ha, hb]))[:K]
    kk_a, kk_b, kk_u = len(ha), len(hb), len(un)
    inter = int((np.isin(un, ha) & np.isin(un, hb)).sum())
    Md = np.float64(int(M))

    def est(hv):
        kk = len(hv)
        if kk < K:
            return np.float64(kk)
        return (K - 1.0) * (Md / np.float64(int(hv[-1])))

    eu = est(un)
    ei = (np.float64(inter) / np.float64(kk_u)) * eu
    return pd.DataFrame({
        "kk_a": [kk_a], "kk_b": [kk_b], "kk_union": [kk_u],
        "inter_in_k": [inter],
        "est_a": [float(_q6(est(ha)))], "est_b": [float(_q6(est(hb)))],
        "est_union": [float(_q6(eu))], "est_inter": [float(_q6(ei))],
    })


D_KMV_SETOPS_SQL = """
WITH ha AS MATERIALIZED (
  SELECT DISTINCT CAST((CAST(l_partkey AS HUGEINT) * 1442695040888963407
           + 1752450205419405103) % 2305843009213693951 AS BIGINT) AS hv
  FROM lineitem WHERE l_quantity >= 25 ORDER BY hv LIMIT 256),
hb AS MATERIALIZED (
  SELECT DISTINCT CAST((CAST(l_partkey AS HUGEINT) * 1442695040888963407
           + 1752450205419405103) % 2305843009213693951 AS BIGINT) AS hv
  FROM lineitem WHERE l_quantity < 25 ORDER BY hv LIMIT 256),
un AS MATERIALIZED (
  SELECT hv FROM (SELECT hv FROM ha UNION SELECT hv FROM hb)
  ORDER BY hv LIMIT 256),
sa AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk, CAST(MAX(hv) AS BIGINT) AS hk
       FROM ha),
sb AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk, CAST(MAX(hv) AS BIGINT) AS hk
       FROM hb),
su AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk, CAST(MAX(hv) AS BIGINT) AS hk
       FROM un),
ix AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM un
       WHERE hv IN (SELECT hv FROM ha) AND hv IN (SELECT hv FROM hb)),
e AS (SELECT
  CASE WHEN sa.kk < 256 THEN CAST(sa.kk AS DOUBLE)
       ELSE 255.0 * (CAST(2305843009213693951 AS DOUBLE)
                     / CAST(sa.hk AS DOUBLE)) END AS ea,
  CASE WHEN sb.kk < 256 THEN CAST(sb.kk AS DOUBLE)
       ELSE 255.0 * (CAST(2305843009213693951 AS DOUBLE)
                     / CAST(sb.hk AS DOUBLE)) END AS eb,
  CASE WHEN su.kk < 256 THEN CAST(su.kk AS DOUBLE)
       ELSE 255.0 * (CAST(2305843009213693951 AS DOUBLE)
                     / CAST(su.hk AS DOUBLE)) END AS eu,
  sa.kk AS kk_a, sb.kk AS kk_b, su.kk AS kk_u, ix.c AS c
  FROM sa, sb, su, ix)
SELECT kk_a, kk_b, kk_u AS kk_union, c AS inter_in_k,
       floor(ea * 1000000 + 0.5005) / 1000000 AS est_a,
       floor(eb * 1000000 + 0.5005) / 1000000 AS est_b,
       floor(eu * 1000000 + 0.5005) / 1000000 AS est_union,
       floor((CAST(c AS DOUBLE) / CAST(kk_u AS DOUBLE)) * eu
             * 1000000 + 0.5005) / 1000000 AS est_inter
FROM e
"""


def q_grouped_ols(sf_dir: str):
    """Per-event-type ordinary least squares TREND of value over time:
    y = value cents, x = hour offset from the global minimum hour.
    Six integer moment partials (n, Σx, Σy, Σxx, Σxy, Σyy) stream out
    of every batch — the textbook mergeable regression — and the
    driver solves slope/intercept/R² from EXACT Python-int cross
    products (n·Σxy − ΣxΣy can overflow int64 at 100 TB; the partials
    themselves stay int64-safe because x≤hours and y≤cents are small),
    quantizing only the three final divisions. SQL mirrors with
    HUGEINT arithmetic."""
    from ray.data.aggregate import Min, Sum

    ts = _read(sf_dir, "events", columns=["ts"])
    mn = ts.aggregate(Min("ts"))["min(ts)"]
    h0 = int(np.datetime64(mn, "us").astype(np.int64)) // 3_600_000_000

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        x = (us // 3_600_000_000 - h0).astype(np.int64)
        y = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "n": 1, "sx": x, "sy": y, "sxx": x * x, "sxy": x * y,
            "syy": y * y,
        })
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "sx", "sy", "sxx", "sxy", "syy")])
        .to_pandas()
        .sort_values("event_type")
    )
    rows = []
    for _, r in g.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, sxy, syy = int(r["sxx"]), int(r["sxy"]), int(r["syy"])
        dx = n * sxx - sx * sx          # exact Python ints
        dy = n * syy - sy * sy
        num = n * sxy - sx * sy
        slope = 0.0 if dx == 0 else float(
            _q6(np.float64(num) / np.float64(dx)))
        intercept = 0.0 if n == 0 or dx == 0 else float(
            _q6((np.float64(sy) - (np.float64(num) / np.float64(dx))
                 * np.float64(sx)) / np.float64(n)))
        r2 = 0.0 if dx == 0 or dy == 0 else float(
            _q6(np.float64(num * num) / (np.float64(dx) * np.float64(dy))))
        rows.append((r["event_type"], n, slope, intercept, r2))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "slope", "intercept", "r2"]
    ).reset_index(drop=True)


Q_GROUPED_OLS_SQL = """
WITH h0 AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS h FROM events),
m AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(epoch_us(ts) // 3600000000 - h0.h) AS HUGEINT) AS sx,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
           AS sy,
         CAST(SUM((epoch_us(ts) // 3600000000 - h0.h)
                  * (epoch_us(ts) // 3600000000 - h0.h)) AS HUGEINT) AS sxx,
         CAST(SUM((epoch_us(ts) // 3600000000 - h0.h)
                  * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
           AS sxy,
         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                  * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
           AS syy
  FROM events CROSS JOIN h0 GROUP BY event_type),
d AS (SELECT event_type, n, sx, sy, sxx, sxy, syy,
             n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy,
             n * sxy - sx * sy AS num
      FROM m)
SELECT event_type, CAST(n AS BIGINT) AS n,
  CASE WHEN dx = 0 THEN 0.0
       ELSE floor(CAST(num AS DOUBLE) / CAST(dx AS DOUBLE)
                  * 1000000 + 0.5005) / 1000000 END AS slope,
  CASE WHEN n = 0 OR dx = 0 THEN 0.0
       ELSE floor((CAST(sy AS DOUBLE)
                   - (CAST(num AS DOUBLE) / CAST(dx AS DOUBLE))
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                  * 1000000 + 0.5005) / 1000000 END AS intercept,
  CASE WHEN dx = 0 OR dy = 0 THEN 0.0
       ELSE floor(CAST(num * num AS DOUBLE)
                  / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))
                  * 1000000 + 0.5005) / 1000000 END AS r2
FROM d ORDER BY event_type
"""


def t_forecast_error(sf_dir: str):
    """Seasonal-naive forecast skill per event type: the hourly count
    series (DENSE over the global [min,max] hour range — silent hours
    are zeros, which a groupby alone would drop) is forecast by its
    own value 24h earlier; MASE = seasonal MAE over lag-1-naive MAE.
    Both absolute-error sums fold as exact integers from one
    O(types×hours) cell exchange; MASE is one quantized division. The
    densification is driver-side over the cell table (tiny), never
    over events."""
    from ray.data.aggregate import Max, Min, Sum

    ts = _read(sf_dir, "events", columns=["ts"])
    mn = ts.aggregate(Min("ts"), Max("ts"))
    h_lo = int(np.datetime64(mn["min(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    h_hi = int(np.datetime64(mn["max(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "h": (us // 3_600_000_000).astype(np.int64), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["event_type", "h"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "h"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    H = h_hi - h_lo + 1
    rows = []
    for et, grp in g.groupby("event_type"):
        y = np.zeros(H, np.int64)
        y[grp["h"].to_numpy(np.int64) - h_lo] = grp["n"].to_numpy(np.int64)
        sae24 = int(np.abs(y[24:] - y[:-24]).sum())
        sae1 = int(np.abs(y[1:] - y[:-1]).sum())
        mase = 0.0 if sae1 == 0 else float(_q6(
            (np.float64(sae24) / np.float64(H - 24))
            / (np.float64(sae1) / np.float64(H - 1))))
        rows.append((et, H, sae24, sae1, mase))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_hours", "sae_seasonal", "sae_naive",
                 "mase"],
    ).sort_values("event_type").reset_index(drop=True)


T_FORECAST_ERROR_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT t.event_type, g.h
         FROM (SELECT DISTINCT event_type FROM events) t
         CROSS JOIN (SELECT unnest(generate_series(b.lo, b.hi)) AS h
                     FROM b) g),
c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
y AS (SELECT grid.event_type, grid.h, COALESCE(c.n, 0) AS n
      FROM grid LEFT JOIN c USING (event_type, h)),
l AS (SELECT event_type, n,
             LAG(n, 24) OVER (PARTITION BY event_type ORDER BY h) AS n24,
             LAG(n, 1) OVER (PARTITION BY event_type ORDER BY h) AS n1
      FROM y),
s AS (SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(abs(n - n24)) FILTER (n24 IS NOT NULL) AS BIGINT)
               AS sae_seasonal,
             CAST(SUM(abs(n - n1)) FILTER (n1 IS NOT NULL) AS BIGINT)
               AS sae_naive
      FROM l GROUP BY event_type)
SELECT event_type, n_hours, sae_seasonal, sae_naive,
  CASE WHEN sae_naive = 0 THEN 0.0
       ELSE floor((CAST(sae_seasonal AS DOUBLE)
                   / CAST(n_hours - 24 AS DOUBLE))
                  / (CAST(sae_naive AS DOUBLE)
                     / CAST(n_hours - 1 AS DOUBLE))
                  * 1000000 + 0.5005) / 1000000 END AS mase
FROM s ORDER BY event_type
"""


def d_class_balance(sf_dir: str):
    """Deterministic class-balanced downsample: every language keeps
    exactly n_min = min class count documents, chosen by the bijective
    Fibonacci-hash order ((doc_id·2654435761) mod 2³² — unique keys,
    so the pick is total-order deterministic across runs and cluster
    sizes, same convention as d_stratified_sample). Class counts come
    from one O(classes) cell exchange; the pick reuses the
    grouped_topn local combiner, so each batch contributes ≤ n_min
    rows per class to the exchange."""
    from ray.data.aggregate import Sum

    from ..stages.sampling import det_hash_u32, grouped_topn

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang"]).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "n": g["count_all"]})

    cls = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("lang").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    n_min = int(cls["n"].min())

    def keyed(batch: pa.Table) -> pa.Table:
        k = det_hash_u32(batch["doc_id"].to_numpy(), seed=0).astype(np.int64)
        return batch.append_column("__key", pa.array(k))

    out = grouped_topn(
        ds.map_batches(keyed, batch_format="pyarrow"),
        key_col="lang", order_col="__key", n=n_min, descending=False,
    )
    return (
        out.to_pandas()[["doc_id", "lang"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


D_CLASS_BALANCE_SQL = """
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
m AS (SELECT MIN(n) AS nm FROM c),
k AS (SELECT doc_id, lang,
             CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
                  AS BIGINT) AS key
      FROM documents)
SELECT doc_id, lang FROM k CROSS JOIN m
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key) <= m.nm
ORDER BY doc_id
"""


def _surv_labels(sf_dir: str):
    """Per-user (duration_us, event) survival labels shared by t_km and
    t_nelson_aalen: first signup → first purchase at-or-after, censored
    at the global observation end. One entity shuffle; returns a small
    driver-side frame of O(users) labels."""
    from ray.data.aggregate import Max

    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"],
               split=True)
    mx = _read(sf_dir, "events", columns=["ts"]).aggregate(Max("ts"))["max(ts)"]
    t_end = int(np.datetime64(mx, "us").astype(np.int64))

    def labels(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "t": us,
            "et": g["event_type"].to_numpy(object),
        })
        signup = df[df["et"] == "signup"].groupby("u")["t"].min()
        m = df[df["et"] == "purchase"].merge(
            signup.rename("t0").reset_index(), on="u")
        t1 = m[m["t"] >= m["t0"]].groupby("u")["t"].min()
        t1 = t1.reindex(signup.index)
        dur = np.where(t1.notna(), t1.to_numpy(np.float64) - signup.to_numpy(),
                       np.float64(t_end) - signup.to_numpy())
        return pd.DataFrame({
            "u": signup.index.to_numpy(np.int64),
            "dur": dur.astype(np.int64),
            "ev": t1.notna().to_numpy(),
        })

    return grouped_map(ds, "user_id", labels).to_pandas()


def t_nelson_aalen(sf_dir: str):
    """Nelson-Aalen cumulative hazard over the same signup→purchase
    labels as t_km: H(t) = Σ_{t_i ≤ t} d_i/n_i. Each step's hazard
    increment floors into integer micro-units, the cumulative sum is an
    exact integer, and the output is one exact division by 1e6 — so
    unlike the product-limit curve there is no transcendental anywhere
    and both engines agree bit-for-bit."""
    u = _surv_labels(sf_dir)
    durs = np.sort(u["dur"].to_numpy(np.int64))
    N = len(durs)
    tt, d = np.unique(u.loc[u["ev"], "dur"].to_numpy(np.int64),
                      return_counts=True)
    n = N - np.searchsorted(durs, tt, side="left")
    term = np.floor(d / n.astype(np.float64) * 1e6 + 0.5005).astype(np.int64)
    cum = np.cumsum(term)
    return pd.DataFrame({
        "duration_us": tt, "n_risk": n, "d_events": d,
        "cum_hazard": cum / 1e6,
    })


T_NELSON_AALEN_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT s.user_id, MIN(epoch_us(e.ts)) AS t1
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t0
      GROUP BY s.user_id),
u AS (SELECT s.user_id,
             COALESCE(p.t1, (SELECT MAX(epoch_us(ts)) FROM events)) - s.t0
               AS dur,
             p.t1 IS NOT NULL AS ev
      FROM s LEFT JOIN p USING (user_id)),
t AS (SELECT dur AS tt, CAST(COUNT(*) AS BIGINT) AS d
      FROM u WHERE ev GROUP BY dur),
r AS (SELECT t.tt, t.d,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM u WHERE u.dur >= t.tt)
               AS n
      FROM t)
SELECT tt AS duration_us, n AS n_risk, d AS d_events,
       SUM(CAST(floor(d / CAST(n AS DOUBLE) * 1000000 + 0.5005) AS BIGINT))
         OVER (ORDER BY tt) / 1000000.0 AS cum_hazard
FROM r ORDER BY tt
"""


def t_did(sf_dir: str):
    """Difference-in-differences over a deterministic natural
    experiment: treatment = odd user_id, post = event at-or-after the
    exact integer midpoint of the observation span. Four (treat, post)
    cells of exact cent sums leave the stream; the four means quantize
    once and the DiD estimate is pure subtraction of those quantized
    doubles (identical in both engines — same quantized-means-first
    discipline as the jackknife)."""
    from ray.data.aggregate import Max, Min, Sum

    ts = _read(sf_dir, "events", columns=["ts"])
    mm = ts.aggregate(Min("ts"), Max("ts"))
    lo = int(np.datetime64(mm["min(ts)"], "us").astype(np.int64))
    hi = int(np.datetime64(mm["max(ts)"], "us").astype(np.int64))
    mid = (lo + hi) // 2

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "treat": (batch["user_id"].to_numpy() % 2 == 1),
            "post": us >= mid,
            "n": 1,
            "s": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby(["treat", "post"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["treat", "post"])
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()
        .set_index(["treat", "post"])
    )

    def mean(tr, po):
        n, s = int(g.loc[(tr, po), "n"]), int(g.loc[(tr, po), "s"])
        return float(_q6(np.float64(s) / np.float64(n) / 100.0)), n

    m_c0, n_c0 = mean(False, False)
    m_c1, n_c1 = mean(False, True)
    m_t0, n_t0 = mean(True, False)
    m_t1, n_t1 = mean(True, True)
    return pd.DataFrame({
        "n_c0": [n_c0], "n_c1": [n_c1], "n_t0": [n_t0], "n_t1": [n_t1],
        "m_c0": [m_c0], "m_c1": [m_c1], "m_t0": [m_t0], "m_t1": [m_t1],
        "did": [(m_t1 - m_t0) - (m_c1 - m_c0)],
    })


T_DID_SQL = """
WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
           FROM events),
c AS (SELECT user_id % 2 = 1 AS treat, epoch_us(ts) >= b.mid AS post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS s
      FROM events CROSS JOIN b GROUP BY 1, 2),
m AS (SELECT treat, post, n,
             floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                   * 1000000 + 0.5005) / 1000000 AS mu
      FROM c),
p AS (SELECT
  MAX(CASE WHEN NOT treat AND NOT post THEN n END) AS n_c0,
  MAX(CASE WHEN NOT treat AND post THEN n END) AS n_c1,
  MAX(CASE WHEN treat AND NOT post THEN n END) AS n_t0,
  MAX(CASE WHEN treat AND post THEN n END) AS n_t1,
  MAX(CASE WHEN NOT treat AND NOT post THEN mu END) AS m_c0,
  MAX(CASE WHEN NOT treat AND post THEN mu END) AS m_c1,
  MAX(CASE WHEN treat AND NOT post THEN mu END) AS m_t0,
  MAX(CASE WHEN treat AND post THEN mu END) AS m_t1
  FROM m)
SELECT n_c0, n_c1, n_t0, n_t1, m_c0, m_c1, m_t0, m_t1,
       (m_t1 - m_t0) - (m_c1 - m_c0) AS did
FROM p
"""


def fe_spline(sf_dir: str):
    """Cubic truncated-power spline basis of l_quantity at fixed public
    knots (15, 30, 45): x, x², x³ and (x−k)₊³ per knot — the regression
    basis that lets a linear model bend. Row-local, zero exchange, and
    because quantity is an integral double ≤ 50 every product is an
    EXACT IEEE double in both engines — no quantizer anywhere."""
    knots = (15.0, 30.0, 45.0)
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def spline(batch: pa.Table) -> pa.Table:
        x = batch["l_quantity"].to_numpy(zero_copy_only=False)
        cols = {
            "l_orderkey": batch["l_orderkey"],
            "l_linenumber": batch["l_linenumber"],
            "x": pa.array(x),
            "x2": pa.array(x * x),
            "x3": pa.array(x * x * x),
        }
        for k in knots:
            d = np.maximum(x - k, 0.0)
            cols[f"spl_{int(k)}"] = pa.array(d * d * d)
        return pa.table(cols)

    return ds.map_batches(spline, batch_format="pyarrow")


FE_SPLINE_SQL = """
SELECT l_orderkey, l_linenumber,
       l_quantity AS x,
       l_quantity * l_quantity AS x2,
       l_quantity * l_quantity * l_quantity AS x3,
       greatest(l_quantity - 15.0, 0.0) * greatest(l_quantity - 15.0, 0.0)
         * greatest(l_quantity - 15.0, 0.0) AS spl_15,
       greatest(l_quantity - 30.0, 0.0) * greatest(l_quantity - 30.0, 0.0)
         * greatest(l_quantity - 30.0, 0.0) AS spl_30,
       greatest(l_quantity - 45.0, 0.0) * greatest(l_quantity - 45.0, 0.0)
         * greatest(l_quantity - 45.0, 0.0) AS spl_45
FROM lineitem
"""


def q_trimmed_mean(sf_dir: str):
    """Per-source 5%-trimmed mean of document length: the robust
    location estimate that survives both tails. One (source, value)
    count-cell exchange; the trim keeps EXACT ranks [k, n−k) (k =
    ⌊n·5/100⌋), a cell straddling a cut contributes only its kept
    multiplicity — pure integer interval arithmetic over cumulative
    counts, then one quantized division. No sort of the data itself,
    only of the tiny distinct-value table."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "v": batch["n_chars"].to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["source", "v"])
    )
    rows = []
    for src, g in jc.groupby("source"):
        cnt = g["n"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        n = int(cnt.sum())
        k = n * 5 // 100
        c_end = np.cumsum(cnt)
        c_start = c_end - cnt
        kept = np.maximum(
            0, np.minimum(c_end, n - k) - np.maximum(c_start, k))
        tsum = int((v * kept).sum())
        rows.append((src, n, k,
                     float(_q6(np.float64(tsum) / np.float64(n - 2 * k)))))
    return pd.DataFrame(
        rows, columns=["source", "n", "k_trim", "trimmed_mean"]
    ).sort_values("source").reset_index(drop=True)


Q_TRIMMED_MEAN_SQL = """
WITH c AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source, n_chars),
t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nn FROM c GROUP BY source),
r AS (SELECT c.source, c.v, c.n, t.nn, t.nn * 5 // 100 AS k,
             CAST(SUM(c.n) OVER (PARTITION BY c.source ORDER BY c.v)
                  AS BIGINT) AS c_end
      FROM c JOIN t USING (source)),
kept AS (SELECT source, nn, k,
                greatest(0, least(c_end, nn - k)
                            - greatest(c_end - n, k)) * v AS contrib
         FROM r)
SELECT source, nn AS n, k AS k_trim,
       floor(CAST(SUM(contrib) AS DOUBLE) / CAST(nn - 2 * k AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS trimmed_mean
FROM kept GROUP BY source, nn, k ORDER BY source
"""


def t_rfm(sf_dir: str):
    """RFM (recency / frequency / monetary) customer segmentation:
    per-user purchase aggregates stream out as mergeable partials
    (count, exact cent sum, max ts), recency measures from the global
    observation end, and each dimension maps to a 1–5 score via the
    EXACT NTILE rank formula (first n mod 5 buckets take ⌈n/5⌉) over
    the deterministic (value, user_id) total order — so the engine's
    integer arithmetic reproduces SQL's NTILE bit-for-bit, ties
    included. Driver sees O(users) rows."""
    from ray.data.aggregate import Max, Sum

    mx = _read(sf_dir, "events", columns=["ts"]).aggregate(Max("ts"))["max(ts)"]
    t_end = int(np.datetime64(mx, "us").astype(np.int64))

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type",
                                          "value"],
               where=pc.field("event_type") == "purchase")

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "f": 1,
            "m": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "last": us,
        })
        g = df.groupby("user_id", as_index=False).agg(
            f=("f", "sum"), m=("m", "sum"), last=("last", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("f", alias_name="f"), Sum("m", alias_name="m"),
                   Max("last", alias_name="last"))
        .to_pandas()
    )
    uid = g["user_id"].to_numpy(np.int64)
    r = t_end - g["last"].to_numpy(np.int64)
    f = g["f"].to_numpy(np.int64)
    m = g["m"].to_numpy(np.int64)

    def ntile5(vals):
        n = len(vals)
        idx = np.lexsort((uid, vals))
        pos = np.empty(n, np.int64)
        pos[idx] = np.arange(n)
        q, rem = divmod(n, 5)
        if q == 0:  # fewer rows than tiles: one row per leading tile
            return pos + 1
        cut = rem * (q + 1)
        return np.where(pos < cut, pos // (q + 1),
                        rem + (pos - cut) // q) + 1

    rs, fs, ms = ntile5(r), ntile5(f), ntile5(m)
    return pd.DataFrame({
        "user_id": uid, "r_us": r, "f": f, "m_cents": m,
        "r_score": rs, "f_score": fs, "m_score": ms,
        "rfm": rs * 100 + fs * 10 + ms,
    }).sort_values("user_id").reset_index(drop=True)


T_RFM_SQL = """
WITH te AS (SELECT MAX(epoch_us(ts)) AS t_end FROM events),
u AS (SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS f,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS m_cents,
             te.t_end - MAX(epoch_us(ts)) AS r_us
      FROM events CROSS JOIN te
      WHERE event_type = 'purchase' GROUP BY user_id, te.t_end),
s AS (SELECT user_id, r_us, f, m_cents,
             NTILE(5) OVER (ORDER BY r_us, user_id) AS r_score,
             NTILE(5) OVER (ORDER BY f, user_id) AS f_score,
             NTILE(5) OVER (ORDER BY m_cents, user_id) AS m_score
      FROM u)
SELECT user_id, r_us, f, m_cents,
       CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
FROM s ORDER BY user_id
"""


def _event_at_rank(sf_dir: str, hour_cum: pd.DataFrame, k: int):
    """(ts_us, event_id) of the k-th event (1-based) in (ts, event_id)
    order, via the classic two-pass distributed order statistic: the
    hour histogram locates the bucket, then ONE pushed-down filtered
    read of that hour (a sliver of the table) sorts locally. hour_cum
    has columns h (sorted) and cum."""
    row = hour_cum[hour_cum["cum"] >= k].iloc[0]
    h, before = int(row["h"]), int(row["cum"] - row["n"])
    lo = np.datetime64(h * 3_600_000_000, "us")
    hi = np.datetime64((h + 1) * 3_600_000_000, "us")
    part = _read(
        sf_dir, "events", columns=["ts", "event_id"],
        where=(pc.field("ts") >= pa.scalar(lo)) & (pc.field("ts") < pa.scalar(hi)),
    ).to_pandas()
    us = part["ts"].to_numpy("datetime64[us]").astype(np.int64)
    order = np.lexsort((part["event_id"].to_numpy(np.int64), us))
    j = order[k - before - 1]
    return int(us[j]), int(part["event_id"].iloc[j])


def t_time_split(sf_dir: str):
    """Out-of-time 70/15/15 split manifest over the total (ts,
    event_id) order — the temporal train/val/test discipline that
    hash splits (d_group_split) cannot give, with EXACT row counts
    (⌊n·70/100⌋ / ⌊n·85/100⌋ boundaries). Nothing global sorts: an
    O(hours) count-cell exchange locates each boundary's hour, and one
    filtered hour-read per needed order statistic resolves the exact
    boundary event. Output is each split's row count and actual
    [min,max] event-time span."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({"h": (us // 3_600_000_000).astype(np.int64),
                           "n": 1})
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    hc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values("h").reset_index(drop=True)
    )
    hc["cum"] = hc["n"].cumsum()
    n = int(hc["n"].sum())
    k_train = n * 70 // 100
    k_val = n * 85 // 100
    ranks = {k: _event_at_rank(sf_dir, hc, k)
             for k in (1, k_train, k_train + 1, k_val, k_val + 1, n)}
    return pd.DataFrame({
        "split": ["test", "train", "val"],
        "n_rows": [n - k_val, k_train, k_val - k_train],
        "min_us": [ranks[k_val + 1][0], ranks[1][0], ranks[k_train + 1][0]],
        "max_us": [ranks[n][0], ranks[k_train][0], ranks[k_val][0]],
    })


T_TIME_SPLIT_SQL = """
WITH o AS (SELECT epoch_us(ts) AS t,
                  ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) AS rk,
                  COUNT(*) OVER () AS n
           FROM events),
s AS (SELECT CASE WHEN rk <= n * 70 // 100 THEN 'train'
                  WHEN rk <= n * 85 // 100 THEN 'val'
                  ELSE 'test' END AS split, t
      FROM o)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(t) AS min_us, MAX(t) AS max_us
FROM s GROUP BY split ORDER BY split
"""


def q_pythagorean_means(sf_dir: str):
    """All three Pythagorean means of document length per source from
    ONE (source, value) count-cell exchange: arithmetic (exact integer
    sum, one quantized division), geometric (per-distinct-value ln
    terms floored to integer micro-units, exact weighted fold, one
    quantized exp — the d_theil pattern), harmonic (1/v terms floored
    at 1e-12 resolution, exact fold, one quantized division). Verifies
    AM ≥ GM ≥ HM as a free invariant."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "v": batch["n_chars"].to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for src, g in jc.groupby("source"):
        v = g["v"].to_numpy(np.float64)
        cnt = g["n"].to_numpy(np.int64)
        N = int(cnt.sum())
        S = int((g["v"].to_numpy(np.int64) * cnt).sum())
        am = _q6(np.float64(S) / np.float64(N))
        ln_fold = int((cnt * np.floor(np.log(v) * 1e6 + 0.5005)
                       .astype(np.int64)).sum())
        gm = _q6(np.exp(np.float64(ln_fold) / (np.float64(N) * 1e6)))
        inv_fold = int((cnt * np.floor(1.0 / v * 1e12 + 0.5005)
                        .astype(np.int64)).sum())
        hm = _q6(np.float64(N) / (np.float64(inv_fold) / 1e12))
        rows.append((src, N, float(am), float(gm), float(hm)))
    return pd.DataFrame(
        rows, columns=["source", "n", "am", "gm", "hm"]
    ).sort_values("source").reset_index(drop=True)


Q_PYTHAGOREAN_MEANS_SQL = """
WITH c AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source, n_chars),
t AS (SELECT source,
             CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(n * v) AS BIGINT) AS ss,
             CAST(SUM(n * CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000
                                     + 0.5005) AS BIGINT)) AS BIGINT)
               AS lf,
             CAST(SUM(n * CAST(floor(1.0 / CAST(v AS DOUBLE)
                                     * 1000000000000 + 0.5005) AS BIGINT))
                  AS BIGINT) AS hf
      FROM c GROUP BY source)
SELECT source, nn AS n,
       floor(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS am,
       floor(exp(CAST(lf AS DOUBLE) / (CAST(nn AS DOUBLE) * 1000000))
             * 1000000 + 0.5005) / 1000000 AS gm,
       floor(CAST(nn AS DOUBLE) / (CAST(hf AS DOUBLE) / 1000000000000)
             * 1000000 + 0.5005) / 1000000 AS hm
FROM t ORDER BY source
"""


def d_vocab_overlap(sf_dir: str):
    """Pairwise source VOCABULARY overlap matrix: per-source distinct
    token sets reduce through in-batch dedup partials and one
    (source, token) exchange, then every source pair with a non-empty
    intersection reports |A∩B| and Jaccard — the data-recipe audit
    that says which corpora are lexically redundant before you pay to
    mix them. O(sources²) output; the exchange is vocabulary-sized,
    never corpus-sized."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "tok": ex.to_numpy(),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    v = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "tok"]).count()
        .to_pandas()
    )
    sets = {s: set(g["tok"]) for s, g in v.groupby("source")}
    rows = []
    for sa in sorted(sets):
        for sb in sorted(sets):
            if sa >= sb:
                continue
            inter = len(sets[sa] & sets[sb])
            if inter == 0:
                continue
            va, vb = len(sets[sa]), len(sets[sb])
            rows.append((sa, sb, va, vb, inter,
                         float(_q6(inter / (va + vb - inter)))))
    return pd.DataFrame(
        rows, columns=["src_a", "src_b", "va", "vb", "inter", "jaccard"])


D_VOCAB_OVERLAP_SQL = """
WITH v AS (SELECT DISTINCT source, tok FROM (
             SELECT source,
                    unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                      AS tok
             FROM documents)),
s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source),
i AS (SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS c
      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2)
SELECT i.sa AS src_a, i.sb AS src_b, x.n AS va, y.n AS vb, i.c AS inter,
       floor(i.c / CAST(x.n + y.n - i.c AS DOUBLE) * 1000000 + 0.5005)
         / 1000000 AS jaccard
FROM i JOIN s x ON x.source = i.sa JOIN s y ON y.source = i.sb
ORDER BY 1, 2
"""


def t_logrank(sf_dir: str):
    """Two-sample log-rank test between odd- and even-user survival
    (same signup→purchase labels as t_km): at every distinct event
    time the hypergeometric expectation d·n₁/n and variance
    d·(n₁/n)(1−n₁/n)(n−d)/(n−1) floor into integer micro-units from
    token-identical float expressions, the O−E and V folds are exact
    integer sums, and z = (O−E)/√V is one division of a shared sqrt —
    the survival-curve significance test next to the curve estimators.
    Risk-set counts come from two sorted searches over O(users)
    labels."""
    u = _surv_labels(sf_dir)
    grp = (u["u"].to_numpy(np.int64) % 2 == 1)
    dur = u["dur"].to_numpy(np.int64)
    ev = u["ev"].to_numpy(bool)

    tt = np.unique(dur[ev])
    d1 = np.zeros(len(tt), np.int64)
    d0 = np.zeros(len(tt), np.int64)
    t1v, c1 = np.unique(dur[ev & grp], return_counts=True)
    t0v, c0 = np.unique(dur[ev & ~grp], return_counts=True)
    d1[np.searchsorted(tt, t1v)] = c1
    d0[np.searchsorted(tt, t0v)] = c0
    s1 = np.sort(dur[grp])
    s0 = np.sort(dur[~grp])
    n1 = len(s1) - np.searchsorted(s1, tt, side="left")
    n0 = len(s0) - np.searchsorted(s0, tt, side="left")
    n = n1 + n0
    d = d1 + d0
    nf, n1f, df = n.astype(np.float64), n1.astype(np.float64), \
        d.astype(np.float64)
    e1 = df * (n1f / nf)
    oe_micro = np.floor((d1.astype(np.float64) - e1) * 1e6 + 0.5005) \
        .astype(np.int64)
    v = np.where(
        n > 1,
        df * (n1f / nf) * (1.0 - n1f / nf)
        * ((nf - df) / np.maximum(nf - 1.0, 1.0)),
        0.0,
    )
    v_micro = np.floor(v * 1e6 + 0.5005).astype(np.int64)
    oe = int(oe_micro.sum()) / 1e6
    vv = int(v_micro.sum()) / 1e6
    z = 0.0 if vv <= 0 else float(_q6(oe / np.sqrt(vv)))
    return pd.DataFrame({
        "n1": [int(grp.sum())], "n0": [int((~grp).sum())],
        "events1": [int(d1.sum())], "events0": [int(d0.sum())],
        "o_minus_e": [oe], "var": [vv], "z": [z],
        "chi2": [float(_q6(z * z))],
    })


T_LOGRANK_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT s.user_id, MIN(epoch_us(e.ts)) AS t1
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t0
      GROUP BY s.user_id),
u AS (SELECT s.user_id, s.user_id % 2 = 1 AS g,
             COALESCE(p.t1, (SELECT MAX(epoch_us(ts)) FROM events)) - s.t0
               AS dur,
             p.t1 IS NOT NULL AS ev
      FROM s LEFT JOIN p USING (user_id)),
t AS (SELECT dur AS tt,
             CAST(COUNT(*) FILTER (g) AS BIGINT) AS d1,
             CAST(COUNT(*) FILTER (NOT g) AS BIGINT) AS d0
      FROM u WHERE ev GROUP BY dur),
r AS (SELECT t.tt, t.d1, t.d0,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM u
              WHERE u.dur >= t.tt AND u.g) AS n1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM u
              WHERE u.dur >= t.tt AND NOT u.g) AS n0
      FROM t),
k AS (SELECT
        CAST(floor((CAST(d1 AS DOUBLE)
                    - CAST(d1 + d0 AS DOUBLE)
                      * (CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)))
                   * 1000000 + 0.5005) AS BIGINT) AS oe_micro,
        CASE WHEN n1 + n0 > 1 THEN
          CAST(floor(CAST(d1 + d0 AS DOUBLE)
                     * (CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                     * (1.0 - CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                     * ((CAST(n1 + n0 AS DOUBLE) - CAST(d1 + d0 AS DOUBLE))
                        / greatest(CAST(n1 + n0 AS DOUBLE) - 1.0, 1.0))
                     * 1000000 + 0.5005) AS BIGINT)
        ELSE 0 END AS v_micro,
        d1, d0
      FROM r),
f AS (SELECT CAST(SUM(oe_micro) AS BIGINT) / 1000000.0 AS oe,
             CAST(SUM(v_micro) AS BIGINT) / 1000000.0 AS vv,
             CAST(SUM(d1) AS BIGINT) AS events1,
             CAST(SUM(d0) AS BIGINT) AS events0
      FROM k),
c AS (SELECT CAST(COUNT(*) FILTER (g) AS BIGINT) AS n1,
             CAST(COUNT(*) FILTER (NOT g) AS BIGINT) AS n0
      FROM u)
SELECT c.n1, c.n0, f.events1, f.events0,
       f.oe AS o_minus_e, f.vv AS var,
       CASE WHEN f.vv <= 0 THEN 0.0
            ELSE floor(f.oe / sqrt(f.vv) * 1000000 + 0.5005) / 1000000
       END AS z,
       CASE WHEN f.vv <= 0 THEN 0.0
            ELSE floor(pow(floor(f.oe / sqrt(f.vv) * 1000000 + 0.5005)
                           / 1000000, 2) * 1000000 + 0.5005) / 1000000
       END AS chi2
FROM f CROSS JOIN c
"""


def q_assoc_rules(sf_dir: str):
    """Market-basket association rules over parts co-purchased in an
    order: ONE grouped_map pass per order emits three cell kinds into
    a single exchange — an order marker, each distinct part once, and
    every within-order pair (k≤lines → k² tiny) — and each bucket
    pre-aggregates its OWN pair counts, so the exchange carries at
    most one row per (bucket, pair). The final combine is DISTRIBUTED:
    cells re-bucket by a deterministic mix of (a,b) — every cell of a
    pair lands in exactly one bucket, mix collisions only co-locate
    extra pairs — and each bucket folds its counts with one C-level
    pandas groupby and applies the support≥3 filter LOCALLY, so what
    reaches the driver is only the surviving rule set plus the
    dimension-sized singles table (needed for confidences; ≤|part|
    rows, the same broadcastable dimension the rest of the repo
    ray.puts). A generic two-key Ray sort-groupby over the raw pair
    stream measured 60s where the bucketed fold takes ~2. Pairs with
    support count ≥3 report support, both confidences and lift, each
    one quantized division of exact integers."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("l_orderkey", sort=False):
            parts = np.unique(grp["l_partkey"].to_numpy(np.int64))
            k = len(parts)
            ai, bi = np.triu_indices(k, k=1)
            out_a.append(np.concatenate(
                [np.array([-1], np.int64), parts, parts[ai]]))
            out_b.append(np.concatenate(
                [np.array([-1], np.int64), np.full(k, -1, np.int64),
                 parts[bi]]))
        df = pd.DataFrame({
            "a": np.concatenate(out_a), "b": np.concatenate(out_b), "n": 1,
        })
        return df.groupby(["a", "b"], as_index=False).sum()

    def enc(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        # deterministic wrap-mix: collisions harmless (combine groups
        # by the real (a,b) inside the bucket), co-location guaranteed
        with np.errstate(over="ignore"):
            pk = a * np.int64(1_000_003) + b
        return batch.append_column("__pk", pa.array(pk))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["a", "b"], as_index=False)["n"].sum()
        return s[(s["a"] == -1) | (s["b"] == -1) | (s["n"] >= 3)]

    counts = grouped_map(
        grouped_map(ds, "l_orderkey", cells)
        .map_batches(enc, batch_format="pyarrow"),
        "__pk", combine,
    ).to_pandas()
    N = int(counts.loc[(counts["a"] == -1) & (counts["b"] == -1), "n"]
            .iloc[0])
    singles = counts[(counts["a"] >= 0) & (counts["b"] == -1)] \
        .set_index("a")["n"]
    pairs = counts[(counts["b"] >= 0) & (counts["n"] >= 3)]
    rows = []
    for _, r in pairs.iterrows():
        a, b, cab = int(r["a"]), int(r["b"]), int(r["n"])
        ca, cb = int(singles.loc[a]), int(singles.loc[b])
        rows.append((
            a, b, cab, ca, cb,
            float(_q6(np.float64(cab) / np.float64(N))),
            float(_q6(np.float64(cab) / np.float64(ca))),
            float(_q6(np.float64(cab) / np.float64(cb))),
            float(_q6(np.float64(cab * N) / np.float64(ca * cb))),
        ))
    return pd.DataFrame(
        rows,
        columns=["a", "b", "c_ab", "c_a", "c_b", "support", "conf_ab",
                 "conf_ba", "lift"],
    ).sort_values(["a", "b"]).reset_index(drop=True)


Q_ASSOC_RULES_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM d),
c AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY p),
pr AS (SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS cab
       FROM d a JOIN d b ON a.o = b.o AND a.p < b.p
       GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT pr.pa AS a, pr.pb AS b, pr.cab AS c_ab, ca.c AS c_a, cb.c AS c_b,
       floor(CAST(pr.cab AS DOUBLE) / CAST(n.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS support,
       floor(CAST(pr.cab AS DOUBLE) / CAST(ca.c AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS conf_ab,
       floor(CAST(pr.cab AS DOUBLE) / CAST(cb.c AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS conf_ba,
       floor(CAST(pr.cab * n.n AS DOUBLE)
             / CAST(ca.c * cb.c AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS lift
FROM pr CROSS JOIN n
JOIN c ca ON ca.p = pr.pa JOIN c cb ON cb.p = pr.pb
ORDER BY 1, 2
"""


def q_benford(sf_dir: str):
    """Benford first-digit audit of prices (exact integer cents): the
    nine digit counts fold exactly; each expected count N·log10(1+1/d)
    quantizes once, the χ² terms (o−e)²/e compute from those shared
    quantized doubles and floor to integer micro-units, and the final
    χ² is an exact integer sum — so the one number an auditor reads is
    bit-identical across engines (a raw 9-double SUM would be at the
    mercy of summation order). First digits come from the decimal
    string, not log10, so 999999→9 and 1000000→1 can never straddle a
    float boundary."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        first = pd.Series(c).astype(str).str[0].astype(np.int64)
        df = pd.DataFrame({"digit": first, "n": 1})
        return pa.Table.from_pandas(
            df.groupby("digit", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("digit").aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values("digit").reset_index(drop=True)
    )
    N = int(g["n"].sum())
    d = g["digit"].to_numpy(np.float64)
    obs = g["n"].to_numpy(np.int64)
    exp = np.floor(np.float64(N) * np.log10(1.0 + 1.0 / d) * 1e6 + 0.5005) \
        / 1e6
    term = (obs.astype(np.float64) - exp) * (obs.astype(np.float64) - exp) \
        / exp
    term_micro = np.floor(term * 1e6 + 0.5005).astype(np.int64)
    chi2 = int(term_micro.sum()) / 1e6
    return pd.DataFrame({
        "digit": g["digit"].to_numpy(np.int64), "observed": obs,
        "expected": exp, "term": term_micro / 1e6, "chi2": chi2,
    })


Q_BENFORD_SQL = """
WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
           FROM lineitem),
f AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM v),
o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed
      FROM f GROUP BY digit),
t AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM o),
e AS (SELECT o.digit, o.observed,
             floor(CAST(t.n AS DOUBLE)
                   * log10(1.0 + 1.0 / CAST(o.digit AS DOUBLE))
                   * 1000000 + 0.5005) / 1000000 AS expected
      FROM o CROSS JOIN t),
k AS (SELECT digit, observed, expected,
             CAST(floor((CAST(observed AS DOUBLE) - expected)
                        * (CAST(observed AS DOUBLE) - expected) / expected
                        * 1000000 + 0.5005) AS BIGINT) AS term_micro
      FROM e)
SELECT digit, observed, expected, term_micro / 1000000.0 AS term,
       CAST(SUM(term_micro) OVER () AS BIGINT) / 1000000.0 AS chi2
FROM k ORDER BY digit
"""


def d_hill_tail(sf_dir: str):
    """Hill tail-index estimator of the document-length distribution
    per source (k=10): α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top k+1
    order statistics — the heavy-tail audit that says whether a
    source's length distribution even HAS a finite mean worth
    packing around. Only the top-11 values per source leave the
    stream (grouped_topn local combiner); ties are harmless because
    the rank-r VALUE is deterministic regardless of which tied row
    wins. ln ratios floor to integer micro-units, the fold is exact,
    α is one quantized division."""
    from ..stages.sampling import grouped_topn

    K = 10
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    top = grouped_topn(
        ds, key_col="source", order_col="n_chars", n=K + 1, descending=True,
    ).to_pandas()
    rows = []
    for src, g in top.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy(np.float64))[::-1]
        xk1 = v[K]
        terms = np.floor(np.log(v[:K] / xk1) * 1e6 + 0.5005) \
            .astype(np.int64)
        fold = int(terms.sum())
        hill_inv = _q6(np.float64(fold) / (np.float64(K) * 1e6))
        alpha = 0.0 if fold == 0 else float(
            _q6(np.float64(K) / (np.float64(fold) / 1e6)))
        rows.append((src, K, int(xk1), float(hill_inv), alpha))
    return pd.DataFrame(
        rows, columns=["source", "k", "x_k1", "hill_inv", "alpha"]
    ).sort_values("source").reset_index(drop=True)


D_HILL_TAIL_SQL = """
WITH r AS (SELECT source, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC) AS rk
           FROM documents),
k1 AS (SELECT source, n_chars AS xk1 FROM r WHERE rk = 11),
t AS (SELECT r.source,
             CAST(SUM(CAST(floor(ln(CAST(r.n_chars AS DOUBLE)
                                    / CAST(k1.xk1 AS DOUBLE))
                                 * 1000000 + 0.5005) AS BIGINT))
                  AS BIGINT) AS fold,
             MAX(k1.xk1) AS xk1
      FROM r JOIN k1 USING (source) WHERE r.rk <= 10
      GROUP BY r.source)
SELECT source, 10 AS k, CAST(xk1 AS BIGINT) AS x_k1,
       floor(CAST(fold AS DOUBLE) / (10.0 * 1000000)
             * 1000000 + 0.5005) / 1000000 AS hill_inv,
       CASE WHEN fold = 0 THEN 0.0
            ELSE floor(10.0 / (CAST(fold AS DOUBLE) / 1000000)
                       * 1000000 + 0.5005) / 1000000 END AS alpha
FROM t ORDER BY source
"""


def _dense_hourly_counts(sf_dir: str):
    """Dense global hourly event-count series: O(hours) count-cell
    exchange, zeros filled driver-side over the [min,max] hour range
    (the same densification t_forecast_error uses)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({"h": (us // 3_600_000_000).astype(np.int64),
                           "n": 1})
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    hc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values("h")
    )
    lo, hi = int(hc["h"].min()), int(hc["h"].max())
    y = np.zeros(hi - lo + 1, np.int64)
    y[hc["h"].to_numpy(np.int64) - lo] = hc["n"].to_numpy(np.int64)
    return y


def t_ljung_box(sf_dir: str):
    """Ljung-Box portmanteau test on the global hourly event-count
    series (lags 1–6): every autocorrelation is an EXACT integer
    ratio — n²·C_k = n²·Σyₜyₜ₊ₖ − n·S·(S_head+S_tail) + (n−k)·S²
    clears the mean without ever forming it — so r_k quantizes once
    per lag and the running Q statistic folds from micro-floored
    r²/(n−k) terms (a raw float Q would inherit SUM-order drift).
    The series itself is the O(hours) dense grid, zeros included."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    S = int(y.sum())
    P0 = int((y.astype(object) * y.astype(object)).sum())
    c0 = n * n * P0 - n * S * S
    rows = []
    cum = 0
    for k in range(1, 7):
        a, b = y[:-k], y[k:]
        Pk = int((a.astype(object) * b.astype(object)).sum())
        sh, st = int(a.sum()), int(b.sum())
        ck = n * n * Pk - n * S * (sh + st) + (n - k) * S * S
        r = float(_q6(np.float64(ck) / np.float64(c0)))
        # r²/(n−k) is ~1e-6-scale: fold at 1e-12 resolution (micro
        # units would round each term to ~2 counts and visibly bias Q)
        term = int(np.floor(r * r / np.float64(n - k) * 1e12 + 0.5005))
        cum += term
        q = float(_q6(np.float64(n * (n + 2)) * (np.float64(cum) / 1e12)))
        rows.append((k, r, q))
    return pd.DataFrame(rows, columns=["lag", "r", "q_stat"])


T_LJUNG_BOX_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
y AS (SELECT grid.h, COALESCE(c.n, 0) AS n FROM grid LEFT JOIN c USING (h)),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
               CAST(SUM(n) AS HUGEINT) AS s,
               CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS p0
        FROM y),
lags AS (SELECT unnest(generate_series(1, 6)) AS k),
pk AS (SELECT lags.k,
              CAST(SUM(CAST(a.n AS HUGEINT) * bb.n) AS HUGEINT) AS p,
              CAST(SUM(a.n) AS HUGEINT) AS sh,
              CAST(SUM(bb.n) AS HUGEINT) AS st
       FROM lags JOIN y a ON TRUE JOIN y bb ON bb.h = a.h + lags.k
       GROUP BY lags.k),
r AS (SELECT pk.k,
             floor(CAST(tot.nn * tot.nn * pk.p
                        - tot.nn * tot.s * (pk.sh + pk.st)
                        + (tot.nn - pk.k) * tot.s * tot.s AS DOUBLE)
                   / CAST(tot.nn * tot.nn * tot.p0
                          - tot.nn * tot.s * tot.s AS DOUBLE)
                   * 1000000 + 0.5005) / 1000000 AS rk,
             CAST(tot.nn AS BIGINT) AS n
      FROM pk CROSS JOIN tot),
t AS (SELECT k, rk, n,
             CAST(floor(rk * rk / CAST(n - k AS DOUBLE)
                        * 1000000000000 + 0.5005) AS BIGINT) AS term
      FROM r)
SELECT k AS lag, rk AS r,
       floor(CAST(n * (n + 2) AS DOUBLE)
             * (CAST(SUM(term) OVER (ORDER BY k) AS DOUBLE)
                / 1000000000000)
             * 1000000 + 0.5005) / 1000000 AS q_stat
FROM t ORDER BY k
"""


def q_runs_test(sf_dir: str):
    """Wald–Wolfowitz runs test for randomness of the hourly
    event-count series around its exact lower median: run count,
    above/below tallies and the median itself are pure integers; the
    normal-approximation z computes once from those integers with a
    shared token order and quantizes once. The audit that catches a
    'random' split that actually alternates — or streaks."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    med = int(np.sort(y)[(n + 1) // 2 - 1])
    above = y > med
    runs = 1 + int((above[1:] != above[:-1]).sum())
    n1 = int(above.sum())
    n0 = n - n1
    if n1 == 0 or n0 == 0:
        z = 0.0
    else:
        nf, n1f, n0f = np.float64(n), np.float64(n1), np.float64(n0)
        mu = 1.0 + 2.0 * n1f * n0f / nf
        s2 = (2.0 * n1f * n0f * (2.0 * n1f * n0f - nf)
              / (nf * nf * (nf - 1.0)))
        z = 0.0 if s2 <= 0 else float(_q6((np.float64(runs) - mu)
                                          / np.sqrt(s2)))
    return pd.DataFrame({
        "n": [n], "median": [med], "n_above": [n1], "n_below": [n0],
        "runs": [runs], "z": [z],
    })


Q_RUNS_TEST_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
y AS (SELECT grid.h, COALESCE(c.n, 0) AS n FROM grid LEFT JOIN c USING (h)),
m AS (SELECT n AS med FROM y ORDER BY n
      LIMIT 1 OFFSET (SELECT (COUNT(*) + 1) // 2 - 1 FROM y)),
s AS (SELECT h, n > m.med AS above,
             LAG(n > m.med) OVER (ORDER BY h) AS prev
      FROM y CROSS JOIN m),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (above) AS BIGINT) AS n1,
             CAST(COUNT(*) FILTER (NOT above) AS BIGINT) AS n0,
             1 + CAST(COUNT(*) FILTER (prev IS NOT NULL
                                       AND above != prev) AS BIGINT)
               AS runs
      FROM s)
SELECT k.n, m.med AS median, k.n1 AS n_above, k.n0 AS n_below, k.runs,
  CASE WHEN k.n1 = 0 OR k.n0 = 0 THEN 0.0
       ELSE floor((CAST(k.runs AS DOUBLE)
                   - (1.0 + 2.0 * CAST(k.n1 AS DOUBLE)
                            * CAST(k.n0 AS DOUBLE) / CAST(k.n AS DOUBLE)))
                  / sqrt(2.0 * CAST(k.n1 AS DOUBLE) * CAST(k.n0 AS DOUBLE)
                         * (2.0 * CAST(k.n1 AS DOUBLE)
                            * CAST(k.n0 AS DOUBLE) - CAST(k.n AS DOUBLE))
                         / (CAST(k.n AS DOUBLE) * CAST(k.n AS DOUBLE)
                            * (CAST(k.n AS DOUBLE) - 1.0)))
                  * 1000000 + 0.5005) / 1000000 END AS z
FROM k CROSS JOIN m
"""


def q_theil_sen(sf_dir: str):
    """Theil–Sen robust trend of the global hourly event-count series:
    the median of all pairwise slopes (and the median residual
    intercept) — the estimator a single corrupted hour cannot move,
    unlike OLS. Every slope is the same double in both engines (int
    difference ratios), and the estimate is an ELEMENT selection from
    that identical multiset (lower median), so no quantizer is needed
    on the slope itself. O(hours²) pairs materialize only driver-side
    over the dense O(hours) cell series."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    i, j = np.triu_indices(n, k=1)
    slopes = (y[j] - y[i]).astype(np.float64) / (j - i).astype(np.float64)
    m = len(slopes)
    slope = float(np.sort(slopes)[(m + 1) // 2 - 1])
    resid = np.sort(y.astype(np.float64)
                    - slope * np.arange(n, dtype=np.float64))
    intercept = float(resid[(n + 1) // 2 - 1])
    return pd.DataFrame({
        "n_hours": [n], "n_pairs": [m],
        "slope": [slope], "intercept": [intercept],
    })


Q_THEIL_SEN_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
y AS (SELECT grid.h - b.lo AS x, COALESCE(c.n, 0) AS n
      FROM grid CROSS JOIN b LEFT JOIN c USING (h)),
s AS (SELECT CAST(bb.n - a.n AS DOUBLE) / CAST(bb.x - a.x AS DOUBLE)
               AS slope
      FROM y a JOIN y bb ON bb.x > a.x),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM s),
sl AS (SELECT slope FROM s ORDER BY slope
       LIMIT 1 OFFSET (SELECT (m + 1) // 2 - 1 FROM m)),
r AS (SELECT CAST(y.n AS DOUBLE) - sl.slope * CAST(y.x AS DOUBLE) AS b
      FROM y CROSS JOIN sl),
ic AS (SELECT b FROM r ORDER BY b
       LIMIT 1 OFFSET (SELECT (COUNT(*) + 1) // 2 - 1 FROM y))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM y) AS n_hours,
       m.m AS n_pairs, sl.slope, ic.b AS intercept
FROM m CROSS JOIN sl CROSS JOIN ic
"""


def q_mann_whitney(sf_dir: str):
    """Mann–Whitney U between odd- and even-user event values: tied
    ranks, the U statistic and the tie-corrected variance all derive
    from EXACT integers over one (value, group) cell exchange —
    doubled rank sums keep the ½-average-ranks integral, Σ(t³−t)
    folds exactly — and z is one quantized division of identically
    ordered doubles. The nonparametric sibling of d_ab_ztest for
    distributions a mean can't summarize."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        odd = (batch["user_id"].to_numpy() % 2 == 1).astype(np.int64)
        df = pd.DataFrame({"v": v, "t1": odd, "t": 1})
        return pa.Table.from_pandas(
            df.groupby("v", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("t1", alias_name="t1"), Sum("t", alias_name="t"))
        .to_pandas().sort_values("v")
    )
    t = g["t"].to_numpy(np.int64)
    t1 = g["t1"].to_numpy(np.int64)
    c_start = np.cumsum(t) - t
    n = int(t.sum())
    n1 = int(t1.sum())
    n0 = n - n1
    r1x2 = int((t1 * (2 * c_start + t + 1)).sum())          # 2·R1, exact
    u1x2 = 2 * n1 * n0 + n1 * (n1 + 1) - r1x2               # 2·U1, exact
    ties = int(((t.astype(object) ** 3) - t.astype(object)).sum())
    u1 = u1x2 / 2.0
    mu = np.float64(n1) * np.float64(n0) / 2.0
    sig2 = (np.float64(n1) * np.float64(n0) / 12.0
            * ((np.float64(n) + 1.0)
               - np.float64(ties)
               / (np.float64(n) * (np.float64(n) - 1.0))))
    z = 0.0 if sig2 <= 0 else float(_q6((u1 - mu) / np.sqrt(sig2)))
    return pd.DataFrame({
        "n1": [n1], "n0": [n0], "u1": [u1], "tie_sum": [ties], "z": [z],
    })


Q_MANN_WHITNEY_SQL = """
WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  CAST(COUNT(*) FILTER (user_id % 2 = 1) AS BIGINT) AS t1,
                  CAST(COUNT(*) AS BIGINT) AS t
           FROM events GROUP BY 1),
r AS (SELECT v, t1, t,
             CAST(SUM(t) OVER (ORDER BY v) - t AS BIGINT) AS c_start
      FROM c),
k AS (SELECT CAST(SUM(t1) AS BIGINT) AS n1,
             CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t1 * (2 * c_start + t + 1)) AS BIGINT) AS r1x2,
             CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS ties
      FROM r)
SELECT n1, n - n1 AS n0,
       (2 * n1 * (n - n1) + n1 * (n1 + 1) - r1x2) / 2.0 AS u1,
       ties AS tie_sum,
       CASE WHEN n1 = 0 OR n1 = n THEN 0.0
            ELSE floor(((2 * n1 * (n - n1) + n1 * (n1 + 1) - r1x2) / 2.0
                        - CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2.0)
                       / sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                              / 12.0
                              * ((CAST(n AS DOUBLE) + 1.0)
                                 - CAST(ties AS DOUBLE)
                                 / (CAST(n AS DOUBLE)
                                    * (CAST(n AS DOUBLE) - 1.0))))
                       * 1000000 + 0.5005) / 1000000 END AS z
FROM k
"""


def d_cross_source_dups(sf_dir: str):
    """Cross-source exact-duplicate audit: which source PAIRS share
    identical documents, and how many — the recipe question 'am I
    paying for the same bytes twice'. The fixture corpus has no
    natural cross-source dups, so both engines replay the same
    deterministic injection (every doc_id % 37 == 0 re-enters under
    the alphabetically NEXT source, id offset +10000001). Content
    travels as md5 cells, never text; the exchange is
    distinct-(hash, source)-sized."""
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    srcs = sorted(
        ds.select_columns(["source"]).unique("source")
    )
    nxt = {s: srcs[(i + 1) % len(srcs)] for i, s in enumerate(srcs)}

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        src = batch["source"].to_numpy(zero_copy_only=False)
        txt = batch["text"].to_numpy(zero_copy_only=False)
        h = np.array([hashlib.md5((t or "").encode()).hexdigest()
                      for t in txt], object)
        inj = ids % 37 == 0
        out_h = np.concatenate([h, h[inj]])
        out_s = np.concatenate([src, np.array([nxt[s] for s in src[inj]],
                                              object)])
        df = pd.DataFrame({"h": out_h, "source": out_s}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    v = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["h", "source"]).count()
        .to_pandas()
    )
    rows = []
    for _, g in v.groupby("h"):
        ss = sorted(g["source"])
        for a in range(len(ss)):
            for b in range(a + 1, len(ss)):
                rows.append((ss[a], ss[b]))
    out = (
        pd.DataFrame(rows, columns=["src_a", "src_b"])
        .groupby(["src_a", "src_b"], as_index=False).size()
        .rename(columns={"size": "n_shared"})
        .sort_values(["src_a", "src_b"]).reset_index(drop=True)
    )
    return out


D_CROSS_SOURCE_DUPS_SQL = """
WITH smap AS (SELECT source, ROW_NUMBER() OVER (ORDER BY source) AS rn
              FROM (SELECT DISTINCT source FROM documents)),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM smap),
allrows AS (
  SELECT source, coalesce(text, '') AS text FROM documents
  UNION ALL
  SELECT s2.source, coalesce(d.text, '') AS text
  FROM documents d
  JOIN smap s1 ON s1.source = d.source
  CROSS JOIN ns
  JOIN smap s2 ON s2.rn = s1.rn % ns.k + 1
  WHERE d.doc_id % 37 = 0),
v AS (SELECT DISTINCT md5(text) AS h, source FROM allrows)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM v a JOIN v b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


def t_changepoint(sf_dir: str):
    """Single change-point detection on the hourly event-count series
    (binary segmentation's first split): the split minimizing total
    SSE maximizes S_L²/n_L + S_R²/n_R, which both engines evaluate as
    IDENTICAL doubles from exact integer prefix sums — so the argmax
    (smallest-hour tie-break) matches bit-for-bit and only the
    reported means/gain quantize. O(hours) work over the dense cell
    series; nothing scans events twice."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    S = int(y.sum())
    cs = np.cumsum(y)
    k = np.arange(1, n)
    sl = cs[:-1].astype(np.float64)
    v = (sl * sl / k.astype(np.float64)
         + (np.float64(S) - sl) * (np.float64(S) - sl)
         / (np.float64(n) - k.astype(np.float64)))
    best = int(np.argmax(v))  # first occurrence = smallest k on ties
    kk = best + 1
    s_l = int(cs[best])
    base = np.float64(S) * np.float64(S) / np.float64(n)
    return pd.DataFrame({
        "split_k": [kk], "n_hours": [n],
        "left_mean": [float(_q6(np.float64(s_l) / np.float64(kk)))],
        "right_mean": [float(_q6(np.float64(S - s_l)
                                 / np.float64(n - kk)))],
        "gain": [float(_q6(np.float64(v[best]) - base))],
    })


T_CHANGEPOINT_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
y AS (SELECT grid.h - b.lo + 1 AS x, COALESCE(c.n, 0) AS n
      FROM grid CROSS JOIN b LEFT JOIN c USING (h)),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(n) AS BIGINT) AS s
      FROM y),
p AS (SELECT x AS k, CAST(SUM(n) OVER (ORDER BY x) AS BIGINT) AS sl
      FROM y),
v AS (SELECT p.k, p.sl, t.nn, t.s,
             CAST(p.sl AS DOUBLE) * CAST(p.sl AS DOUBLE)
               / CAST(p.k AS DOUBLE)
             + (CAST(t.s AS DOUBLE) - CAST(p.sl AS DOUBLE))
               * (CAST(t.s AS DOUBLE) - CAST(p.sl AS DOUBLE))
               / (CAST(t.nn AS DOUBLE) - CAST(p.k AS DOUBLE)) AS val
      FROM p CROSS JOIN t WHERE p.k < t.nn)
SELECT k AS split_k, nn AS n_hours,
       floor(CAST(sl AS DOUBLE) / CAST(k AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS left_mean,
       floor(CAST(s - sl AS DOUBLE) / CAST(nn - k AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS right_mean,
       floor((val - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(nn AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS gain
FROM v ORDER BY val DESC, k LIMIT 1
"""


def q_abc(sf_dir: str):
    """ABC / Pareto revenue classification of parts: gross revenue per
    part folds as exact integer cents, parts order by (revenue DESC,
    partkey) and the 80%/95% class boundaries are STRICT integer
    comparisons (cum·5 ≤ 4·total, cum·20 ≤ 19·total) — no float ever
    touches a boundary decision. The per-part aggregate streams; the
    O(parts) class assignment is driver-side (at 100 TB the running
    share would reuse the ordered-cumsum two-pass layout)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": batch["l_partkey"].to_numpy(),
            "rev": np.floor(batch["l_extendedprice"].to_numpy() * 100
                            + 0.5).astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("l_partkey", as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("l_partkey").aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values(["rev", "l_partkey"], ascending=[False, True])
    )
    rev = g["rev"].to_numpy(np.int64)
    total = int(rev.sum())
    cum = np.cumsum(rev)
    cls = np.where(cum * 5 <= 4 * total, "A",
                   np.where(cum * 20 <= 19 * total, "B", "C"))
    out = pd.DataFrame({"cls": cls, "rev": rev}) \
        .groupby("cls", as_index=False) \
        .agg(n_parts=("rev", "size"), revenue_cents=("rev", "sum"))
    out["share"] = [
        float(_q6(np.float64(int(r)) / np.float64(total)))
        for r in out["revenue_cents"]
    ]
    return out.sort_values("cls").reset_index(drop=True)


Q_ABC_SQL = """
WITH p AS (SELECT l_partkey,
                  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                AS BIGINT)) AS BIGINT) AS rev
           FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM p),
r AS (SELECT p.rev, t.total,
             CAST(SUM(p.rev) OVER (ORDER BY p.rev DESC, p.l_partkey)
                  AS BIGINT) AS cum
      FROM p CROSS JOIN t),
k AS (SELECT CASE WHEN cum * 5 <= 4 * total THEN 'A'
                  WHEN cum * 20 <= 19 * total THEN 'B'
                  ELSE 'C' END AS cls,
             rev, total
      FROM r)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       floor(CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS share
FROM k GROUP BY cls ORDER BY cls
"""


def t_integrity(sf_dir: str):
    """Temporal referential-integrity audit of the event log: users
    whose first purchase PRECEDES their first signup (clock skew /
    pipeline bugs), purchasers with no signup at all, and signups that
    never purchase — the three rot modes of an event stream, counted
    from per-user firsts through one entity shuffle. Pure integer
    timestamp comparisons; no quantizer."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"],
               split=True)

    def firsts(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "t": us,
            "et": g["event_type"].to_numpy(object),
        })
        s = df[df["et"] == "signup"].groupby("u")["t"].min()
        p = df[df["et"] == "purchase"].groupby("u")["t"].min()
        users = df["u"].unique()
        out = pd.DataFrame({"u": users})
        out["s"] = s.reindex(users).to_numpy()
        out["p"] = p.reindex(users).to_numpy()
        return out

    f = grouped_map(ds, "user_id", firsts).to_pandas()
    has_s = f["s"].notna().to_numpy()
    has_p = f["p"].notna().to_numpy()
    both = has_s & has_p
    before = int((f.loc[both, "p"].to_numpy()
                  < f.loc[both, "s"].to_numpy()).sum())
    return pd.DataFrame({
        "n_users": [len(f)],
        "n_purchase_before_signup": [before],
        "n_orphan_purchasers": [int((has_p & ~has_s).sum())],
        "n_signup_only": [int((has_s & ~has_p).sum())],
    })


T_INTEGRITY_SQL = """
WITH u AS (SELECT user_id,
                  MIN(CASE WHEN event_type = 'signup'
                           THEN epoch_us(ts) END) AS s,
                  MIN(CASE WHEN event_type = 'purchase'
                           THEN epoch_us(ts) END) AS p
           FROM events GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(*) FILTER (s IS NOT NULL AND p IS NOT NULL AND p < s)
            AS BIGINT) AS n_purchase_before_signup,
       CAST(COUNT(*) FILTER (p IS NOT NULL AND s IS NULL) AS BIGINT)
         AS n_orphan_purchasers,
       CAST(COUNT(*) FILTER (s IS NOT NULL AND p IS NULL) AS BIGINT)
         AS n_signup_only
FROM u
"""


def d_wasserstein(sf_dir: str):
    """Per-source Wasserstein-1 (earth mover's) distance between the
    source's document-length distribution and the WHOLE corpus — the
    drift metric with units (chars) that KS's sup-norm lacks. Over the
    corpus's merged value grid, |cumA·n_C − cumC·n_A|·gap folds as an
    EXACT integer (the CDF difference never becomes a float), and W₁
    is one quantized division by n_A·n_C. One (source, value)
    count-cell exchange feeds everything."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "v": batch["n_chars"].to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    grid = np.sort(jc["v"].unique())
    gaps = np.diff(grid).astype(object)
    corpus = jc.groupby("v")["n"].sum().reindex(grid, fill_value=0)
    cum_c = np.cumsum(corpus.to_numpy(np.int64))[:-1].astype(object)
    n_c = int(corpus.sum())
    rows = []
    for src, g in jc.groupby("source"):
        a = g.set_index("v")["n"].reindex(grid, fill_value=0)
        cum_a = np.cumsum(a.to_numpy(np.int64))[:-1].astype(object)
        n_a = int(a.sum())
        fold = int((np.abs(cum_a * n_c - cum_c * n_a) * gaps).sum())
        rows.append((src, n_a,
                     float(_q6(np.float64(fold)
                               / (np.float64(n_a) * np.float64(n_c))))))
    return pd.DataFrame(rows, columns=["source", "n", "w1"]) \
        .sort_values("source").reset_index(drop=True)


D_WASSERSTEIN_SQL = """
WITH c AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source, n_chars),
grid AS (SELECT DISTINCT v FROM c),
srcs AS (SELECT source, CAST(SUM(n) AS BIGINT) AS na FROM c
         GROUP BY source),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM documents),
cc AS (SELECT g.v,
              CAST(SUM(COALESCE(x.n, 0))
                   OVER (ORDER BY g.v) AS BIGINT) AS cum_c,
              LEAD(g.v) OVER (ORDER BY g.v) - g.v AS gap
       FROM grid g LEFT JOIN (SELECT v, CAST(SUM(n) AS BIGINT) AS n
                              FROM c GROUP BY v) x USING (v)),
ca AS (SELECT s.source, g.v,
              CAST(SUM(COALESCE(c.n, 0))
                   OVER (PARTITION BY s.source ORDER BY g.v) AS BIGINT)
                AS cum_a
       FROM srcs s CROSS JOIN grid g
       LEFT JOIN c ON c.source = s.source AND c.v = g.v),
f AS (SELECT ca.source,
             CAST(SUM(abs(CAST(ca.cum_a AS HUGEINT) * tot.nc
                          - CAST(cc.cum_c AS HUGEINT) * srcs.na)
                      * cc.gap) AS HUGEINT) AS fold
      FROM ca JOIN cc USING (v)
      CROSS JOIN tot JOIN srcs ON srcs.source = ca.source
      WHERE cc.gap IS NOT NULL
      GROUP BY ca.source)
SELECT f.source, srcs.na AS n,
       floor(CAST(f.fold AS DOUBLE)
             / (CAST(srcs.na AS DOUBLE) * CAST(tot.nc AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS w1
FROM f JOIN srcs USING (source) CROSS JOIN tot ORDER BY f.source
"""


def d_rbo(sf_dir: str):
    """Rank-biased overlap (p=½) between the top-25 token rankings of
    the odd- and even-doc_id halves of the corpus — the top-weighted
    list-similarity IR uses where Kendall over-penalizes tail churn.
    p=½ makes every geometric weight 2^(1−d), EXACT in IEEE, so each
    depth's overlap/d·p^(d−1) term is the same double in both engines;
    terms fold at 1e-12 resolution (SUM order immune) and normalize by
    the exact 2−2^(1−k). Rankings derive from exact token counts with
    token-text tie-break."""
    from ray.data.aggregate import Sum

    K = 25
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        ids = pd.Series(batch["doc_id"].to_numpy())
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        half = (ids.iloc[ex.index.to_numpy(np.int64)].to_numpy() % 2) \
            .astype(np.int64)
        df = pd.DataFrame({"half": half, "tok": ex.to_numpy(), "n": 1})
        return pa.Table.from_pandas(
            df.groupby(["half", "tok"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["half", "tok"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    def topk(h):
        t = g[g["half"] == h].sort_values(["n", "tok"],
                                          ascending=[False, True])
        return t["tok"].to_numpy(object)[:K]

    a, b = topk(0), topk(1)
    fold = 0
    for d in range(1, K + 1):
        ov = len(set(a[:d]) & set(b[:d]))
        term = (np.float64(ov) / np.float64(d)) * (0.5 ** (d - 1))
        fold += int(np.floor(term * 1e12 + 0.5005))
    norm = 2.0 - 0.5 ** (K - 1)
    rbo = float(_q6((np.float64(fold) / 1e12) / norm))
    return pd.DataFrame({
        "k": [K], "top1_match": [bool(a[0] == b[0])], "rbo": [rbo],
    })


D_RBO_SQL = """
WITH u AS (SELECT doc_id % 2 AS half,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT half, tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY half, tok),
r AS (SELECT half, tok,
             ROW_NUMBER() OVER (PARTITION BY half
                                ORDER BY n DESC, tok) AS rk
      FROM c),
a AS (SELECT tok, rk FROM r WHERE half = 0 AND rk <= 25),
b AS (SELECT tok, rk FROM r WHERE half = 1 AND rk <= 25),
m AS (SELECT a.rk AS ra, b.rk AS rb FROM a JOIN b USING (tok)),
d AS (SELECT unnest(generate_series(1, 25)) AS d),
t AS (SELECT d.d,
             CAST(floor((CAST((SELECT COUNT(*) FROM m
                               WHERE m.ra <= d.d AND m.rb <= d.d)
                              AS DOUBLE) / CAST(d.d AS DOUBLE))
                        * pow(0.5, d.d - 1)
                        * 1000000000000 + 0.5005) AS BIGINT) AS term
      FROM d)
SELECT 25 AS k,
       (SELECT a.tok = b.tok FROM a, b WHERE a.rk = 1 AND b.rk = 1)
         AS top1_match,
       floor((CAST(SUM(term) AS DOUBLE) / 1000000000000)
             / (2.0 - pow(0.5, 24))
             * 1000000 + 0.5005) / 1000000 AS rbo
FROM t
"""


def q_anova(sf_dir: str):
    """One-way ANOVA of event value (exact integer cents) across event
    types: per-group (n, Σc, Σc²) partials fold exactly; each group's
    S²/n term floors to integer micro-units so the between-group sum
    is order-immune, and F / η² are single quantized expressions over
    those shared doubles. The parametric sibling of q_mann_whitney."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "n": 1, "s": c, "q": c * c,
        })
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("q", alias_name="q"))
        .to_pandas()
    )
    k = len(g)
    N = int(g["n"].sum())
    S = int(g["s"].sum())
    Q = int(g["q"].sum())
    fold = int(sum(
        int(np.floor(np.float64(int(r["s"])) * np.float64(int(r["s"]))
                     / np.float64(int(r["n"])) * 1e6 + 0.5005))
        for _, r in g.iterrows()
    ))
    grp = np.float64(fold) / 1e6
    ssb = grp - np.float64(S) * np.float64(S) / np.float64(N)
    ssw = np.float64(Q) - grp
    f = (ssb / np.float64(k - 1)) / (ssw / np.float64(N - k))
    eta2 = ssb / (ssb + ssw)
    return pd.DataFrame({
        "k": [k], "n": [N],
        "ssb": [float(_q6(ssb))], "ssw": [float(_q6(ssw))],
        "f_stat": [float(_q6(f))], "eta2": [float(_q6(eta2))],
    })


Q_ANOVA_SQL = """
WITH g AS (SELECT event_type,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS s,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                           * CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS q
           FROM events GROUP BY event_type),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS BIGINT) AS ss,
             CAST(SUM(q) AS BIGINT) AS qq,
             CAST(SUM(CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                 / CAST(n AS DOUBLE)
                                 * 1000000 + 0.5005) AS BIGINT))
                  AS BIGINT) AS fold
      FROM g),
e AS (SELECT k, nn,
             CAST(fold AS DOUBLE) / 1000000
               - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                 / CAST(nn AS DOUBLE) AS ssb,
             CAST(qq AS DOUBLE) - CAST(fold AS DOUBLE) / 1000000 AS ssw
      FROM t)
SELECT k, nn AS n,
       floor(ssb * 1000000 + 0.5005) / 1000000 AS ssb,
       floor(ssw * 1000000 + 0.5005) / 1000000 AS ssw,
       floor((ssb / CAST(k - 1 AS DOUBLE))
             / (ssw / CAST(nn - k AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS f_stat,
       floor(ssb / (ssb + ssw) * 1000000 + 0.5005) / 1000000 AS eta2
FROM e
"""


def t_spectral(sf_dir: str):
    """Daily-cycle DFT coefficient of the hourly event-count series:
    cos/sin weights repeat with period 24, so both engines build the
    SAME 24-entry micro-quantized trig table (the 0.0005 guard band
    absorbs libm ulp drift) and the a/b folds are EXACT integer sums
    of count × table entries. Amplitude and the share of variance at
    the 24h line then derive from shared doubles with one final
    quantize each — a spectral seasonality score with no FFT and no
    float accumulation anywhere."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    k = np.arange(24, dtype=np.float64)
    cos_m = np.floor(np.cos(2.0 * np.pi * k / 24.0) * 1e6 + 0.5005) \
        .astype(np.int64)
    sin_m = np.floor(np.sin(2.0 * np.pi * k / 24.0) * 1e6 + 0.5005) \
        .astype(np.int64)
    ph = np.arange(n) % 24
    a_fold = int((y * cos_m[ph]).sum())
    b_fold = int((y * sin_m[ph]).sum())
    a = np.float64(a_fold) / 1e6
    b = np.float64(b_fold) / 1e6
    amp = 2.0 * np.sqrt(a * a + b * b) / np.float64(n)
    S = int(y.sum())
    Q = int((y.astype(object) * y.astype(object)).sum())
    sst = np.float64(Q) - np.float64(S) * np.float64(S) / np.float64(n)
    power = 2.0 * (a * a + b * b) / np.float64(n)
    return pd.DataFrame({
        "n_hours": [n],
        "a": [float(_q6(a))], "b": [float(_q6(b))],
        "amplitude": [float(_q6(amp))],
        "power_share": [float(_q6(power / sst)) if sst > 0 else 0.0],
    })


T_SPECTRAL_SQL = """
WITH b0 AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                   MAX(epoch_us(ts)) // 3600000000 AS hi
            FROM events),
grid AS (SELECT unnest(generate_series(b0.lo, b0.hi)) AS h FROM b0),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
y AS (SELECT grid.h - b0.lo AS x, COALESCE(c.n, 0) AS n
      FROM grid CROSS JOIN b0 LEFT JOIN c USING (h)),
trig AS (SELECT k,
                CAST(floor(cos(2 * pi() * k / 24.0) * 1000000 + 0.5005)
                     AS BIGINT) AS cm,
                CAST(floor(sin(2 * pi() * k / 24.0) * 1000000 + 0.5005)
                     AS BIGINT) AS sm
         FROM (SELECT unnest(generate_series(0, 23)) AS k)),
f AS (SELECT CAST(SUM(y.n * trig.cm) AS BIGINT) AS af,
             CAST(SUM(y.n * trig.sm) AS BIGINT) AS bf,
             CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(y.n) AS BIGINT) AS s,
             CAST(SUM(CAST(y.n AS HUGEINT) * y.n) AS HUGEINT) AS q
      FROM y JOIN trig ON trig.k = y.x % 24),
e AS (SELECT nn,
             CAST(af AS DOUBLE) / 1000000 AS a,
             CAST(bf AS DOUBLE) / 1000000 AS b,
             CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(nn AS DOUBLE) AS sst
      FROM f)
SELECT nn AS n_hours,
       floor(a * 1000000 + 0.5005) / 1000000 AS a,
       floor(b * 1000000 + 0.5005) / 1000000 AS b,
       floor(2.0 * sqrt(a * a + b * b) / CAST(nn AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS amplitude,
       CASE WHEN sst <= 0 THEN 0.0
            ELSE floor(2.0 * (a * a + b * b) / CAST(nn AS DOUBLE) / sst
                       * 1000000 + 0.5005) / 1000000 END AS power_share
FROM e
"""


def d_bootstrap_ci(sf_dir: str):
    """Replayable bootstrap 90% CI of per-source mean document length:
    every resample index is the PUBLIC affine hash mod 2^61−1 of a
    (source-ordinal, replicate, draw) triple reduced mod n — so both
    engines draw the identical 40×200 resamples, every replicate mean
    is an exact integer sum with one quantized division, and the CI
    bounds are ELEMENT selections from the identical sorted replicate
    multiset. The bootstrap nobody can accuse of cherry-picked seeds:
    the randomness is part of the spec. Values reach the driver as
    (source, value) cells; at 100 TB you'd bootstrap a per-source
    reservoir instead."""
    from ray.data.aggregate import Sum

    from ..stages.text import _mulmod61

    M = np.uint64((1 << 61) - 1)
    A = np.uint64(1442695040888963407)
    BB = np.uint64(6364136223846793005 % ((1 << 61) - 1))
    REPS, DRAWS = 40, 200

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "v": batch["n_chars"].to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values(["source", "v"])
    )
    srcs = sorted(jc["source"].unique())
    rows = []
    for s_ord, src in enumerate(srcs, start=1):
        g = jc[jc["source"] == src]
        vals = np.repeat(g["v"].to_numpy(np.int64),
                         g["n"].to_numpy(np.int64))  # ascending (sorted)
        n = len(vals)
        b, i = np.meshgrid(np.arange(1, REPS + 1),
                           np.arange(1, DRAWS + 1), indexing="ij")
        x = (s_ord * 1_000_000 + b * 1000 + i).astype(np.uint64)
        h = _mulmod61(x.ravel(), np.broadcast_to(A, x.size)) + BB
        h = np.where(h >= M, h - M, h).reshape(x.shape)
        r = (h % np.uint64(n)).astype(np.int64)
        means = np.sort(_q6(vals[r].sum(axis=1) / np.float64(DRAWS)))
        rows.append((src, n,
                     float(means[1]),                      # 2nd of 40 ≈ p5
                     float(_q6(np.float64(int(vals.sum()))
                               / np.float64(n))),
                     float(means[REPS - 2])))              # 39th ≈ p95
    return pd.DataFrame(
        rows, columns=["source", "n", "ci_lo", "mean", "ci_hi"]
    ).reset_index(drop=True)


D_BOOTSTRAP_CI_SQL = """
WITH smap AS (SELECT source, ROW_NUMBER() OVER (ORDER BY source) AS so,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY source),
rv AS (SELECT source, n_chars AS v,
              ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars)
                AS rk
       FROM documents),
grid AS (SELECT smap.source, smap.so, smap.n, bb.b, ii.i
         FROM smap
         CROSS JOIN (SELECT unnest(generate_series(1, 40)) AS b) bb
         CROSS JOIN (SELECT unnest(generate_series(1, 200)) AS i) ii),
drw AS (SELECT g.source, g.b,
               CAST((CAST(g.so * 1000000 + g.b * 1000 + g.i AS HUGEINT)
                     * 1442695040888963407 + 1752450205419405103)
                    % 2305843009213693951 % g.n + 1 AS BIGINT) AS rk
        FROM grid g),
mn AS (SELECT d.source, d.b,
              floor(CAST(SUM(rv.v) AS DOUBLE) / 200.0
                    * 1000000 + 0.5005) / 1000000 AS m
       FROM drw d JOIN rv ON rv.source = d.source AND rv.rk = d.rk
       GROUP BY d.source, d.b),
rkd AS (SELECT source, m,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY m) AS r
        FROM mn),
agg AS (SELECT source,
               MAX(CASE WHEN r = 2 THEN m END) AS ci_lo,
               MAX(CASE WHEN r = 39 THEN m END) AS ci_hi
        FROM rkd GROUP BY source),
base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                floor(CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                      * 1000000 + 0.5005) / 1000000 AS mean
         FROM documents GROUP BY source)
SELECT base.source, base.n, agg.ci_lo, base.mean, agg.ci_hi
FROM base JOIN agg USING (source) ORDER BY base.source
"""


def d_js_divergence(sf_dir: str):
    """Jensen–Shannon divergence of every source's unigram distribution
    from the corpus distribution — the bounded, symmetric drift score
    (0 ≤ JSD ≤ ln 2) data-mixture papers report where KL would blow up
    on missing tokens. Every p·ln(p/m) and c·ln(c/m) term is a rational
    of exact token counts evaluated as the same double in both engines
    and floored to 1e-9 units, so the two half-sums fold exactly. One
    (source, token) count exchange, vocabulary-sized."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "tok": ex.to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "tok"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    corpus = g.groupby("tok")["n"].sum()
    n_c = int(corpus.sum())
    rows = []
    for src, gg in g.groupby("source"):
        a = gg.set_index("tok")["n"]
        n_a = int(a.sum())
        # per-token p, c, m over the union support (source tokens plus
        # the rest of the corpus; tokens absent from the source only
        # contribute to the c·ln(c/m) half)
        toks = corpus.index
        av = a.reindex(toks, fill_value=0).to_numpy(np.int64)
        cv = corpus.to_numpy(np.int64)
        p = av.astype(np.float64) / np.float64(n_a)
        c = cv.astype(np.float64) / np.float64(n_c)
        m = 0.5 * (p + c)
        tp = np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0) / m), 0.0)
        tc = np.where(c > 0, c * np.log(np.where(c > 0, c, 1.0) / m), 0.0)
        fp = int(np.where(p > 0,
                          np.floor(tp * 1e9 + 0.5005), 0).astype(np.int64)
                 .sum())
        fc = int(np.where(c > 0,
                          np.floor(tc * 1e9 + 0.5005), 0).astype(np.int64)
                 .sum())
        jsd = _q6(0.5 * (np.float64(fp) / 1e9)
                  + 0.5 * (np.float64(fc) / 1e9))
        rows.append((src, n_a, float(jsd)))
    return pd.DataFrame(rows, columns=["source", "n_tok", "jsd"]) \
        .sort_values("source").reset_index(drop=True)


D_JS_DIVERGENCE_SQL = """
WITH u AS (SELECT source,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY source, tok),
ct AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS nc FROM c GROUP BY tok),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_c FROM c),
sa AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_a FROM c
       GROUP BY source),
grid AS (SELECT sa.source, sa.n_a, ct.tok, ct.nc,
                COALESCE(c.n, 0) AS na
         FROM sa CROSS JOIN ct
         LEFT JOIN c ON c.source = sa.source AND c.tok = ct.tok),
t AS (SELECT g.source,
             CAST(SUM(CASE WHEN g.na > 0 THEN
               CAST(floor((CAST(g.na AS DOUBLE) / CAST(g.n_a AS DOUBLE))
                 * ln((CAST(g.na AS DOUBLE) / CAST(g.n_a AS DOUBLE))
                      / (0.5 * (CAST(g.na AS DOUBLE)
                                / CAST(g.n_a AS DOUBLE)
                                + CAST(g.nc AS DOUBLE)
                                  / CAST(tot.n_c AS DOUBLE))))
                 * 1000000000 + 0.5005) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(
               CAST(floor((CAST(g.nc AS DOUBLE) / CAST(tot.n_c AS DOUBLE))
                 * ln((CAST(g.nc AS DOUBLE) / CAST(tot.n_c AS DOUBLE))
                      / (0.5 * (CAST(g.na AS DOUBLE)
                                / CAST(g.n_a AS DOUBLE)
                                + CAST(g.nc AS DOUBLE)
                                  / CAST(tot.n_c AS DOUBLE))))
                 * 1000000000 + 0.5005) AS BIGINT)) AS BIGINT) AS fc,
             MAX(g.n_a) AS n_a
      FROM grid g CROSS JOIN tot
      GROUP BY g.source)
SELECT source, n_a AS n_tok,
       floor((0.5 * (CAST(fp AS DOUBLE) / 1000000000)
              + 0.5 * (CAST(fc AS DOUBLE) / 1000000000))
             * 1000000 + 0.5005) / 1000000 AS jsd
FROM t ORDER BY source
"""


def q_kendall_tau(sf_dir: str):
    """Kendall τ-b between quantity and discount from the 50×11 joint
    contingency grid — concordant/discordant pair counts and both tie
    corrections are EXACT integer sums over cell pairs (the O(n²) pair
    space never materializes; only O(cells²) over a tiny grid), and
    τ-b is one quantized division. The rank-correlation sibling of
    q_spearman that handles heavy ties honestly."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "x": batch["l_quantity"].to_numpy().astype(np.int64),
            "y": np.floor(batch["l_discount"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["x", "y"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["x", "y"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    x = g["x"].to_numpy(np.int64)
    y = g["y"].to_numpy(np.int64)
    cn = g["n"].to_numpy(np.int64).astype(object)
    lt_x = x[:, None] < x[None, :]
    lt_y = y[:, None] < y[None, :]
    gt_y = y[:, None] > y[None, :]
    pairprod = cn[:, None] * cn[None, :]
    C = int(pairprod[lt_x & lt_y].sum())
    D = int(pairprod[lt_x & gt_y].sum())
    n = int(cn.sum())
    n0 = n * (n - 1) // 2
    tx = pd.Series(g["n"].to_numpy(np.int64)).groupby(x).sum()
    ty = pd.Series(g["n"].to_numpy(np.int64)).groupby(y).sum()
    n1 = int(sum(int(t) * (int(t) - 1) // 2 for t in tx))
    n2 = int(sum(int(t) * (int(t) - 1) // 2 for t in ty))
    tau = float(_q6(np.float64(C - D)
                    / np.sqrt(np.float64(n0 - n1) * np.float64(n0 - n2))))
    return pd.DataFrame({
        "n": [n], "concordant": [C], "discordant": [D],
        "ties_x": [n1], "ties_y": [n2], "tau_b": [tau],
    })


Q_KENDALL_TAU_SQL = """
WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
cd AS (SELECT
         CAST(SUM(CASE WHEN a.x < b.x AND a.y < b.y
                       THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END)
              AS BIGINT) AS c,
         CAST(SUM(CASE WHEN a.x < b.x AND a.y > b.y
                       THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END)
              AS BIGINT) AS d
       FROM c a CROSS JOIN c b),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(n) * (SUM(n) - 1) // 2 AS BIGINT) AS n0
      FROM c),
tx AS (SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS n1
       FROM (SELECT CAST(SUM(n) AS BIGINT) AS s FROM c GROUP BY x)),
ty AS (SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS n2
       FROM (SELECT CAST(SUM(n) AS BIGINT) AS s FROM c GROUP BY y))
SELECT t.n, cd.c AS concordant, cd.d AS discordant,
       tx.n1 AS ties_x, ty.n2 AS ties_y,
       floor(CAST(cd.c - cd.d AS DOUBLE)
             / sqrt(CAST(t.n0 - tx.n1 AS DOUBLE)
                    * CAST(t.n0 - ty.n2 AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS tau_b
FROM cd CROSS JOIN t CROSS JOIN tx CROSS JOIN ty
"""


def d_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve: the share of total token mass the
    top-k tokens capture, at k = 1,2,4,…,256 (clamped to the realized
    vocabulary) — the plot that sizes a vocab before you train a
    tokenizer. Ranking is exact counts with token-text tie-break;
    cumulative mass is an exact integer; each coverage point is one
    quantized division. Vocabulary-sized exchange."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text"])

    def cells(batch: pa.Table) -> pa.Table:
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({"tok": ex.to_numpy(), "n": 1})
        return pa.Table.from_pandas(
            df.groupby("tok", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values(["n", "tok"], ascending=[False, True])
    )
    cum = np.cumsum(g["n"].to_numpy(np.int64))
    total = int(cum[-1])
    vocab = len(g)
    rows = [(k, vocab, int(cum[k - 1]),
             float(_q6(np.float64(int(cum[k - 1])) / np.float64(total))))
            for k in (1, 2, 4, 8, 16, 32, 64, 128, 256) if k <= vocab]
    return pd.DataFrame(rows, columns=["k", "vocab", "mass", "coverage"])


D_VOCAB_COVERAGE_SQL = """
WITH u AS (SELECT unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
             AS tok
           FROM documents),
c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY tok),
r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk FROM c),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM c),
cm AS (SELECT rk, CAST(SUM(n) OVER (ORDER BY rk) AS BIGINT) AS cum
       FROM r),
ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256]) AS k)
SELECT ks.k, t.vocab, cm.cum AS mass,
       floor(CAST(cm.cum AS DOUBLE) / CAST(t.total AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS coverage
FROM ks JOIN cm ON cm.rk = ks.k CROSS JOIN t
WHERE ks.k <= t.vocab
ORDER BY ks.k
"""


def q_bowley(sf_dir: str):
    """Bowley (quartile) skewness of price per returnflag: Q1/Q2/Q3
    are EXACT ELEMENTS of the input selected by cumulative-count rank
    over value cells (⌈n/4⌉, ⌈n/2⌉, ⌈3n/4⌉), so the only quantized
    number is the final (Q1+Q3−2Q2)/(Q3−Q1) ratio — the robust
    skewness that ignores everything outside the quartiles."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "f": batch["l_returnflag"].to_pandas(),
            "v": np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["f", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    # driver pandas fold for the same reason as q_weighted_median:
    # near-unique cents make the 2-column Ray groupby shuffle-bound
    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["f", "v"], as_index=False)["n"].sum()
        .sort_values(["f", "v"])
    )
    rows = []
    for f, g in jc.groupby("f"):
        cnt = g["n"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)

        def el(r):
            return int(v[np.searchsorted(cum, r)])

        q1 = el(-(-n // 4))        # ceil(n/4)
        q2 = el(-(-n // 2))
        q3 = el(-(-(3 * n) // 4))
        skew = 0.0 if q3 == q1 else float(
            _q6(np.float64(q1 + q3 - 2 * q2) / np.float64(q3 - q1)))
        rows.append((f, n, q1, q2, q3, skew))
    return pd.DataFrame(
        rows, columns=["l_returnflag", "n", "q1", "q2", "q3", "bowley"]
    ).sort_values("l_returnflag").reset_index(drop=True)


Q_BOWLEY_SQL = """
WITH c AS (SELECT l_returnflag AS f,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
t AS (SELECT f, CAST(SUM(n) AS BIGINT) AS nn FROM c GROUP BY f),
r AS (SELECT c.f, c.v, t.nn,
             CAST(SUM(c.n) OVER (PARTITION BY c.f ORDER BY c.v)
                  AS BIGINT) AS cum
      FROM c JOIN t USING (f)),
q AS (SELECT f, nn,
             MIN(CASE WHEN cum >= (nn + 3) // 4 THEN v END) AS q1,
             MIN(CASE WHEN cum >= (nn + 1) // 2 THEN v END) AS q2,
             MIN(CASE WHEN cum >= (3 * nn + 3) // 4 THEN v END) AS q3
      FROM r GROUP BY f, nn)
SELECT f AS l_returnflag, nn AS n, q1, q2, q3,
       CASE WHEN q3 = q1 THEN 0.0
            ELSE floor(CAST(q1 + q3 - 2 * q2 AS DOUBLE)
                       / CAST(q3 - q1 AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END AS bowley
FROM q ORDER BY f
"""


def q_cramers_v(sf_dir: str):
    """Cramér's V association between language and source — the
    normalized χ² that says whether two categorical labelings are
    redundant before you stratify on both. Expected cell counts are
    rationals of exact marginals; each (o−e)²/e term evaluates as the
    same double in both engines and floors to micro units, so χ² folds
    exactly and V is one quantized sqrt-ratio. O(langs×sources)
    exchange."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch["lang"].to_pandas(),
            "source": batch["source"].to_pandas(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["lang", "source"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "source"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = g.pivot_table(index="lang", columns="source", values="n",
                        fill_value=0, aggfunc="sum")
    o = piv.to_numpy(np.int64)
    row = o.sum(axis=1, keepdims=True).astype(np.int64)
    col = o.sum(axis=0, keepdims=True).astype(np.int64)
    n = int(o.sum())
    e = row.astype(np.float64) * col.astype(np.float64) / np.float64(n)
    term = (o.astype(np.float64) - e) * (o.astype(np.float64) - e) / e
    fold = int(np.floor(term * 1e6 + 0.5005).astype(np.int64).sum())
    chi2 = np.float64(fold) / 1e6
    r, c = o.shape
    v = np.sqrt(chi2 / (np.float64(n) * np.float64(min(r, c) - 1)))
    return pd.DataFrame({
        "n": [n], "n_lang": [r], "n_source": [c],
        "chi2": [float(_q6(chi2))], "cramers_v": [float(_q6(v))],
    })


Q_CRAMERS_V_SQL = """
WITH o AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY lang, source),
rl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS r FROM o GROUP BY lang),
cl AS (SELECT source, CAST(SUM(n) AS BIGINT) AS c FROM o GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST((SELECT COUNT(*) FROM rl) AS BIGINT) AS nr,
             CAST((SELECT COUNT(*) FROM cl) AS BIGINT) AS nc
      FROM o),
grid AS (SELECT rl.lang, cl.source, rl.r, cl.c, COALESCE(o.n, 0) AS n
         FROM rl CROSS JOIN cl
         LEFT JOIN o ON o.lang = rl.lang AND o.source = cl.source),
k AS (SELECT CAST(SUM(CAST(floor(
               (CAST(g.n AS DOUBLE)
                - CAST(g.r AS DOUBLE) * CAST(g.c AS DOUBLE)
                  / CAST(t.nn AS DOUBLE))
               * (CAST(g.n AS DOUBLE)
                  - CAST(g.r AS DOUBLE) * CAST(g.c AS DOUBLE)
                    / CAST(t.nn AS DOUBLE))
               / (CAST(g.r AS DOUBLE) * CAST(g.c AS DOUBLE)
                  / CAST(t.nn AS DOUBLE))
               * 1000000 + 0.5005) AS BIGINT)) AS BIGINT) AS fold
      FROM grid g CROSS JOIN t)
SELECT t.nn AS n, t.nr AS n_lang, t.nc AS n_source,
       floor(CAST(k.fold AS DOUBLE) / 1000000
             * 1000000 + 0.5005) / 1000000 AS chi2,
       floor(sqrt((CAST(k.fold AS DOUBLE) / 1000000)
                  / (CAST(t.nn AS DOUBLE)
                     * CAST(least(t.nr, t.nc) - 1 AS DOUBLE)))
             * 1000000 + 0.5005) / 1000000 AS cramers_v
FROM k CROSS JOIN t
"""


def t_fano(sf_dir: str):
    """Fano factor (index of dispersion, var/mean) of each event
    type's hourly arrival counts over the dense global hour grid —
    the one-number test of whether arrivals are Poisson (≈1), bursty
    (>1) or regular (<1). Per-type n, Σy, Σy² are exact integers
    (silent hours are zeros both engines materialize); variance uses
    the n−1 denominator and one quantized division each for var,
    mean, fano."""
    from ray.data.aggregate import Max, Min, Sum

    ts = _read(sf_dir, "events", columns=["ts"])
    mm = ts.aggregate(Min("ts"), Max("ts"))
    lo = int(np.datetime64(mm["min(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    hi = int(np.datetime64(mm["max(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    H = hi - lo + 1

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "h": (us // 3_600_000_000).astype(np.int64), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["event_type", "h"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "h"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, grp in g.groupby("event_type"):
        y = np.zeros(H, np.int64)
        y[grp["h"].to_numpy(np.int64) - lo] = grp["n"].to_numpy(np.int64)
        S = int(y.sum())
        Q = int((y.astype(object) * y.astype(object)).sum())
        mean = _q6(np.float64(S) / np.float64(H))
        var = _q6((np.float64(Q)
                   - np.float64(S) * np.float64(S) / np.float64(H))
                  / np.float64(H - 1))
        fano = _q6(float(var) / float(mean)) if mean > 0 else 0.0
        rows.append((et, H, S, float(mean), float(var), float(fano)))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_hours", "total", "mean", "var", "fano"],
    ).sort_values("event_type").reset_index(drop=True)


T_FANO_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT t.event_type, g.h
         FROM (SELECT DISTINCT event_type FROM events) t
         CROSS JOIN (SELECT unnest(generate_series(b.lo, b.hi)) AS h
                     FROM b) g),
c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
y AS (SELECT grid.event_type, COALESCE(c.n, 0) AS n
      FROM grid LEFT JOIN c USING (event_type, h)),
s AS (SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS hh,
             CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS q
      FROM y GROUP BY event_type),
e AS (SELECT event_type, hh, s,
             floor(CAST(s AS DOUBLE) / CAST(hh AS DOUBLE)
                   * 1000000 + 0.5005) / 1000000 AS mean,
             floor((CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(hh AS DOUBLE))
                   / CAST(hh - 1 AS DOUBLE)
                   * 1000000 + 0.5005) / 1000000 AS var
      FROM s)
SELECT event_type, hh AS n_hours, s AS total, mean, var,
       CASE WHEN mean <= 0 THEN 0.0
            ELSE floor(var / mean * 1000000 + 0.5005) / 1000000
       END AS fano
FROM e ORDER BY event_type
"""


def t_decayed_mean(sf_dir: str):
    """Recency-weighted (time-decayed) mean event value per type with
    a one-week half-life, the feature-store staple — made EXACT by
    flooring age to whole weeks so every weight is a power of two:
    v·2^(K−k) folds as an exact integer (K = max week bucket), the
    weight fold likewise, and the decayed mean is ONE quantized
    division. No exp(), no per-row float weight, no sum-order drift."""
    from ray.data.aggregate import Max, Sum

    mx = _read(sf_dir, "events", columns=["ts"]).aggregate(Max("ts"))["max(ts)"]
    t_end = int(np.datetime64(mx, "us").astype(np.int64))
    WEEK_US = 7 * 24 * 3_600_000_000
    KMAX = 16  # clamp: weights below 2^-16 are dust

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        k = np.minimum((t_end - us) // WEEK_US, KMAX).astype(np.int64)
        w = np.int64(1) << (KMAX - k)
        v = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        if len(v):
            _guard_i64(int(np.abs(v).max()) * (1 << KMAX) * len(v),
                       "t_decayed_mean v*w fold")
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "num": v * w, "den": w,
        })
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("num", alias_name="num"), Sum("den", alias_name="den"))
        .to_pandas().sort_values("event_type")
    )
    rows = []
    for _, r in g.iterrows():
        num, den = int(r["num"]), int(r["den"])
        rows.append((r["event_type"], num, den,
                     float(_q6(np.float64(num) / np.float64(den) / 100.0))))
    return pd.DataFrame(
        rows, columns=["event_type", "num", "den", "decayed_mean"]
    ).reset_index(drop=True)


T_DECAYED_MEAN_SQL = """
WITH te AS (SELECT MAX(epoch_us(ts)) AS t_end FROM events),
c AS (SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT)
               * (CAST(1 AS BIGINT)
                  << CAST(16 - least((te.t_end - epoch_us(ts))
                                     // 604800000000, 16) AS INT))
               AS num,
             (CAST(1 AS BIGINT)
              << CAST(16 - least((te.t_end - epoch_us(ts))
                                 // 604800000000, 16) AS INT)) AS den
      FROM events CROSS JOIN te)
SELECT event_type,
       CAST(SUM(num) AS BIGINT) AS num,
       CAST(SUM(den) AS BIGINT) AS den,
       floor(CAST(SUM(num) AS DOUBLE) / CAST(SUM(den) AS DOUBLE) / 100.0
             * 1000000 + 0.5005) / 1000000 AS decayed_mean
FROM c GROUP BY event_type ORDER BY event_type
"""


def d_heaps(sf_dir: str):
    """Heaps-law vocabulary-growth exponent from two checkpoints: the
    corpus's first half (by doc_id order statistic, exact) vs the
    whole — β = ln(V_full/V_half)/ln(N_full/N_half). Distinct-token
    and token-total counts are exact integers in both engines, so β
    is one quantized ratio of identical ln doubles. The two-point
    estimate a tokenizer-budget planner needs without re-scanning at
    every prefix."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    n_docs = _table_nrows(sf_dir, "documents")
    # order statistic: the (n//2)-th smallest doc_id = half threshold
    ids = ds.select_columns(["doc_id"]).to_pandas()["doc_id"] \
        .to_numpy(np.int64)
    thr = int(np.sort(ids)[n_docs // 2 - 1])

    def cells(batch: pa.Table) -> pa.Table:
        idv = pd.Series(batch["doc_id"].to_numpy())
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        half = (idv.iloc[ex.index.to_numpy(np.int64)].to_numpy()
                <= thr).astype(np.int64)
        df = pd.DataFrame({"tok": ex.to_numpy(), "h": half, "n": 1})
        return pa.Table.from_pandas(
            df.groupby(["tok", "h"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["tok", "h"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_full = int(g["n"].sum())
    v_full = g["tok"].nunique()
    gh = g[g["h"] == 1]
    n_half = int(gh["n"].sum())
    v_half = gh["tok"].nunique()
    beta = _q6(np.log(np.float64(v_full) / np.float64(v_half))
               / np.log(np.float64(n_full) / np.float64(n_half)))
    return pd.DataFrame({
        "n_half": [n_half], "v_half": [v_half],
        "n_full": [n_full], "v_full": [v_full],
        "beta": [float(beta)],
    })


D_HEAPS_SQL = """
WITH thr AS (SELECT doc_id AS t FROM documents ORDER BY doc_id
             LIMIT 1 OFFSET (SELECT COUNT(*) // 2 - 1 FROM documents)),
u AS (SELECT doc_id,
             unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) AS tok
      FROM documents),
f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_full,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS v_full
      FROM u),
h AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_half,
             CAST(COUNT(DISTINCT u.tok) AS BIGINT) AS v_half
      FROM u CROSS JOIN thr WHERE u.doc_id <= thr.t)
SELECT h.n_half, h.v_half, f.n_full, f.v_full,
       floor(ln(CAST(f.v_full AS DOUBLE) / CAST(h.v_half AS DOUBLE))
             / ln(CAST(f.n_full AS DOUBLE) / CAST(h.n_half AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS beta
FROM f CROSS JOIN h
"""


def t_drawdown(sf_dir: str):
    """Maximum drawdown of the cumulative hourly event-value series:
    running sum, running max and the drawdown itself are ALL exact
    integer cents over the dense hour grid, and the peak/trough hours
    break ties deterministically at first occurrence — the risk
    metric with zero float anywhere except the final dollars
    conversion."""
    from ray.data.aggregate import Max, Min, Sum

    ts = _read(sf_dir, "events", columns=["ts"])
    mm = ts.aggregate(Min("ts"), Max("ts"))
    lo = int(np.datetime64(mm["min(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    hi = int(np.datetime64(mm["max(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    H = hi - lo + 1

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "h": (us // 3_600_000_000).astype(np.int64),
            "s": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("s", alias_name="s"))
        .to_pandas()
    )
    y = np.zeros(H, np.int64)
    y[g["h"].to_numpy(np.int64) - lo] = g["s"].to_numpy(np.int64)
    run = np.cumsum(y)
    runmax = np.maximum.accumulate(run)
    dd = runmax - run
    best = int(np.argmax(dd))  # first occurrence on ties
    return pd.DataFrame({
        "n_hours": [H],
        "max_drawdown_cents": [int(dd[best])],
        "trough_hour": [best + lo],
        "final_cents": [int(run[-1])],
    })


T_DRAWDOWN_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS s
      FROM events GROUP BY 1),
y AS (SELECT grid.h, COALESCE(c.s, 0) AS s FROM grid LEFT JOIN c USING (h)),
r0 AS (SELECT h, CAST(SUM(s) OVER (ORDER BY h) AS BIGINT) AS run FROM y),
r AS (SELECT h, run,
             CAST(MAX(run) OVER (ORDER BY h) AS BIGINT) AS runmax
      FROM r0),
d AS (SELECT h, runmax - run AS dd, run FROM r)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM y) AS n_hours,
       d.dd AS max_drawdown_cents,
       d.h AS trough_hour,
       (SELECT run FROM r ORDER BY h DESC LIMIT 1) AS final_cents
FROM d ORDER BY d.dd DESC, d.h LIMIT 1
"""


def t_growth_accounting(sf_dir: str):
    """Weekly growth accounting — active / new / retained /
    resurrected / churned users per week, the canonical product
    health report — from one distinct (user, week) presence exchange:
    active and new are per-week counts, retained is presence in both
    w−1 and w, and churned/resurrected FOLLOW from the identity
    (churned_w = active_{w−1} − retained_w; resurrected_w = active_w −
    new_w − retained_w). Pure integer set logic; no quantizer."""
    WEEK_US = 7 * 24 * 3_600_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "w": (us // WEEK_US).astype(np.int64),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    p = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["user_id", "w"]).count()
        .to_pandas()[["user_id", "w"]]
    )
    first = p.groupby("user_id")["w"].min()
    weeks = np.arange(int(p["w"].min()), int(p["w"].max()) + 1)
    sets = {w: set(p.loc[p["w"] == w, "user_id"]) for w in weeks}
    rows = []
    prev: set = set()
    for w in weeks:
        cur = sets[w]
        active = len(cur)
        new = int((first == w).sum())
        retained = len(cur & prev)
        rows.append((int(w), active, new, retained,
                     active - new - retained, len(prev) - retained))
        prev = cur
    return pd.DataFrame(
        rows,
        columns=["week", "active", "new", "retained", "resurrected",
                 "churned"],
    )


T_GROWTH_ACCOUNTING_SQL = """
WITH p AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 604800000000 AS w
           FROM events),
f AS (SELECT user_id, MIN(w) AS fw FROM p GROUP BY user_id),
b AS (SELECT MIN(w) AS lo, MAX(w) AS hi FROM p),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS w FROM b),
act AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS active FROM p GROUP BY w),
nw AS (SELECT fw AS w, CAST(COUNT(*) AS BIGINT) AS new FROM f GROUP BY fw),
ret AS (SELECT a.w, CAST(COUNT(*) AS BIGINT) AS retained
        FROM p a JOIN p b2 ON b2.user_id = a.user_id AND b2.w = a.w - 1
        GROUP BY a.w)
SELECT grid.w AS week,
       COALESCE(act.active, 0) AS active,
       COALESCE(nw.new, 0) AS new,
       COALESCE(ret.retained, 0) AS retained,
       COALESCE(act.active, 0) - COALESCE(nw.new, 0)
         - COALESCE(ret.retained, 0) AS resurrected,
       COALESCE(LAG(act.active) OVER (ORDER BY grid.w), 0)
         - COALESCE(ret.retained, 0) AS churned
FROM grid
LEFT JOIN act USING (w) LEFT JOIN nw USING (w) LEFT JOIN ret USING (w)
ORDER BY week
"""


def t_durbin_watson(sf_dir: str):
    """Durbin–Watson autocorrelation test on the residuals of the
    hourly-count time trend — with the residuals SCALED to exact
    integers: R_t = n·den·y_t − n·num·t − (Sy·den − num·Sx) clears
    both the slope and intercept denominators, so Σ(ΔR)² and ΣR² are
    exact integer folds (HUGEINT in SQL, Python ints here) and DW is
    ONE quantized division. The regression-diagnostics classic with
    zero float residuals."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    t = np.arange(n, dtype=np.int64)
    Sx, Sy = int(t.sum()), int(y.sum())
    Sxx = int((t * t).sum())
    Sxy = int((t * y).sum())
    num = n * Sxy - Sx * Sy
    den = n * Sxx - Sx * Sx
    c0 = Sy * den - num * Sx
    R = [n * den * int(yv) - n * num * int(tv) - c0
         for yv, tv in zip(y, t)]
    sum_sq = sum(r * r for r in R)
    sum_d2 = sum((R[i] - R[i - 1]) ** 2 for i in range(1, n))
    dw = float(_q6(np.float64(sum_d2) / np.float64(sum_sq)))
    return pd.DataFrame({
        "n_hours": [n],
        "slope": [float(_q6(np.float64(num) / np.float64(den)))],
        "dw": [dw],
    })


T_DURBIN_WATSON_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
y AS (SELECT grid.h - b.lo AS t, COALESCE(c.n, 0) AS n
      FROM grid CROSS JOIN b LEFT JOIN c USING (h)),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
             CAST(SUM(t) AS HUGEINT) AS sx,
             CAST(SUM(n) AS HUGEINT) AS sy,
             CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(t AS HUGEINT) * n) AS HUGEINT) AS sxy
      FROM y),
k AS (SELECT nn, sx, sy,
             nn * sxy - sx * sy AS num,
             nn * sxx - sx * sx AS den
      FROM m),
r AS (SELECT y.t,
             k.nn * k.den * y.n - k.nn * k.num * y.t
               - (k.sy * k.den - k.num * k.sx) AS rr
      FROM y CROSS JOIN k),
d AS (SELECT rr, rr - LAG(rr) OVER (ORDER BY t) AS dr FROM r),
s AS (SELECT CAST(SUM(rr * rr) AS HUGEINT) AS sum_sq,
             CAST(SUM(dr * dr) AS HUGEINT) AS sum_d2
      FROM d)
SELECT CAST(k.nn AS BIGINT) AS n_hours,
       floor(CAST(k.num AS DOUBLE) / CAST(k.den AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS slope,
       floor(CAST(s.sum_d2 AS DOUBLE) / CAST(s.sum_sq AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS dw
FROM s CROSS JOIN k
"""


def q_jarque_bera(sf_dir: str):
    """Jarque–Bera normality test of document length per source: the
    four raw power sums P1..P4 stream as exact int64 partials (v ≤
    ~5k keeps Σv⁴ inside int64 at fixture scales; at 100 TB you'd
    carry hi/lo limbs), central moments evaluate as token-identical
    doubles in both engines, skewness/kurtosis quantize once, and JB
    recomputes from the QUANTIZED pair so cross-engine agreement is
    structural. The pre-modeling check that says whether a Gaussian
    assumption is even on the table."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy().astype(np.int64)
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "n": 1, "p1": v, "p2": v * v, "p3": v * v * v,
            "p4": v * v * v * v,
        })
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("n", "p1", "p2", "p3", "p4")])
        .to_pandas().sort_values("source")
    )
    rows = []
    for _, r in g.iterrows():
        n = np.float64(int(r["n"]))
        p1, p2 = np.float64(int(r["p1"])), np.float64(int(r["p2"]))
        p3, p4 = np.float64(int(r["p3"])), np.float64(int(r["p4"]))
        mu = p1 / n
        m2 = p2 / n - mu * mu
        m3 = p3 / n - 3.0 * mu * (p2 / n) + 2.0 * mu * mu * mu
        m4 = (p4 / n - 4.0 * mu * (p3 / n) + 6.0 * mu * mu * (p2 / n)
              - 3.0 * mu * mu * mu * mu)
        skew = float(_q6(m3 / (m2 * np.sqrt(m2))))
        kurt = float(_q6(m4 / (m2 * m2) - 3.0))
        jb = float(_q6(n / 6.0 * (skew * skew + kurt * kurt / 4.0)))
        rows.append((r["source"], int(r["n"]), skew, kurt, jb))
    return pd.DataFrame(
        rows, columns=["source", "n", "skew", "kurtosis", "jb"]
    ).reset_index(drop=True)


Q_JARQUE_BERA_SQL = """
WITH g AS (SELECT source,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(n_chars) AS BIGINT) AS p1,
                  CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
                    AS p2,
                  CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars * n_chars)
                       AS HUGEINT) AS p3,
                  CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars * n_chars
                           * n_chars) AS HUGEINT) AS p4
           FROM documents GROUP BY source),
m AS (SELECT source, n,
             CAST(p1 AS DOUBLE) / n AS mu,
             CAST(p2 AS DOUBLE) / n AS q2,
             CAST(p3 AS DOUBLE) / n AS q3,
             CAST(p4 AS DOUBLE) / n AS q4
      FROM g),
c AS (SELECT source, n,
             q2 - mu * mu AS m2,
             q3 - 3.0 * mu * q2 + 2.0 * mu * mu * mu AS m3,
             q4 - 4.0 * mu * q3 + 6.0 * mu * mu * q2
               - 3.0 * mu * mu * mu * mu AS m4
      FROM m),
s AS (SELECT source, n,
             floor(m3 / (m2 * sqrt(m2)) * 1000000 + 0.5005) / 1000000
               AS skew,
             floor((m4 / (m2 * m2) - 3.0) * 1000000 + 0.5005) / 1000000
               AS kurtosis
      FROM c)
SELECT source, n, skew, kurtosis,
       floor(CAST(n AS DOUBLE) / 6.0
             * (skew * skew + kurtosis * kurtosis / 4.0)
             * 1000000 + 0.5005) / 1000000 AS jb
FROM s ORDER BY source
"""


def t_cohort_ltv(sf_dir: str):
    """Cohort LTV curves: users grouped by signup week, cumulative
    purchase revenue per cohort by week-age (purchases at-or-after the
    signup week only) — the retention-economics triangle every growth
    team reads. One entity shuffle tags each purchase with its user's
    cohort and age, an O(cohorts×ages) cent-cell exchange feeds the
    window cumsum, and LTV-per-user is the only quantized number."""
    from ray.data.aggregate import Sum

    from ..stages.temporal import grouped_map

    WEEK_US = 7 * 24 * 3_600_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type",
                                          "value"],
               split=True)

    def tag(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64),
            "w": us // WEEK_US,
            "et": g["event_type"].to_numpy(object),
            "c": np.floor(g["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        cohort = df[df["et"] == "signup"].groupby("u")["w"].min()
        p = df[df["et"] == "purchase"].merge(
            cohort.rename("cw").reset_index(), on="u")
        p = p[p["w"] >= p["cw"]]
        cells = p.assign(age=p["w"] - p["cw"], n=1).groupby(
            ["cw", "age"], as_index=False).agg(
            n=("n", "sum"), rev=("c", "sum"))
        sizes = cohort.reset_index().groupby("w", as_index=False) \
            .agg(users=("u", "size")).rename(columns={"w": "cw"})
        sizes["age"] = -1  # size marker rows share the exchange
        sizes["n"] = sizes.pop("users")
        sizes["rev"] = 0
        return pd.concat([cells, sizes[["cw", "age", "n", "rev"]]],
                         ignore_index=True)

    cells = (
        grouped_map(ds, "user_id", tag)
        .groupby(["cw", "age"])
        .aggregate(Sum("n", alias_name="n"), Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    sizes = cells[cells["age"] == -1].set_index("cw")["n"]
    body = cells[cells["age"] >= 0].sort_values(["cw", "age"])
    rows = []
    for cw, g in body.groupby("cw"):
        users = int(sizes.loc[cw])
        cum = 0
        for _, r in g.iterrows():
            cum += int(r["rev"])
            rows.append((int(cw), int(r["age"]), int(r["n"]),
                         int(r["rev"]), cum, users,
                         float(_q6(np.float64(cum) / np.float64(users)
                                   / 100.0))))
    return pd.DataFrame(
        rows,
        columns=["cohort_week", "age_weeks", "n_purchases",
                 "revenue_cents", "cum_revenue_cents", "cohort_users",
                 "ltv_per_user"],
    )


T_COHORT_LTV_SQL = """
WITH s AS (SELECT user_id,
                  MIN(epoch_us(ts) // 604800000000) AS cw
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
sz AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS users FROM s GROUP BY cw),
p AS (SELECT s.cw,
             epoch_us(e.ts) // 604800000000 - s.cw AS age,
             CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS c
      FROM s JOIN events e ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) // 604800000000 >= s.cw),
cells AS (SELECT cw, age, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS rev
          FROM p GROUP BY cw, age),
k AS (SELECT cw, age, n, rev,
             CAST(SUM(rev) OVER (PARTITION BY cw ORDER BY age)
                  AS BIGINT) AS cum
      FROM cells)
SELECT k.cw AS cohort_week, k.age AS age_weeks, k.n AS n_purchases,
       k.rev AS revenue_cents, k.cum AS cum_revenue_cents,
       sz.users AS cohort_users,
       floor(CAST(k.cum AS DOUBLE) / CAST(sz.users AS DOUBLE) / 100.0
             * 1000000 + 0.5005) / 1000000 AS ltv_per_user
FROM k JOIN sz USING (cw) ORDER BY cohort_week, age_weeks
"""


def q_median_test(sf_dir: str):
    """Mood's median test: does any event type's value distribution
    sit above or below the others' shared center? The global lower
    median is an exact ELEMENT (rank ⌈n/2⌉ over value cells), the
    types×2 above/at-or-below contingency is pure integer counts, and
    χ² folds from micro-floored (o−e)²/e terms — the location test
    that needs no distributional assumptions at all."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(), "v": v, "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["event_type", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "v"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    vg = jc.groupby("v")["n"].sum().sort_index()
    n = int(vg.sum())
    cum = vg.cumsum()
    med = int(vg.index[np.searchsorted(cum.to_numpy(), (n + 1) // 2)])
    above = jc[jc["v"] > med].groupby("event_type")["n"].sum()
    total = jc.groupby("event_type")["n"].sum()
    types = sorted(total.index)
    a = np.array([int(above.get(t, 0)) for t in types], np.int64)
    tot = np.array([int(total.loc[t]) for t in types], np.int64)
    b = tot - a
    A, B = int(a.sum()), int(b.sum())
    ea = tot.astype(np.float64) * np.float64(A) / np.float64(n)
    eb = tot.astype(np.float64) * np.float64(B) / np.float64(n)
    term = ((a - ea) * (a - ea) / ea) + ((b - eb) * (b - eb) / eb)
    fold = int(np.floor(term * 1e6 + 0.5005).astype(np.int64).sum())
    return pd.DataFrame({
        "n": [n], "median_cents": [med], "k": [len(types)],
        "n_above": [A],
        "chi2": [float(_q6(np.float64(fold) / 1e6))],
    })


Q_MEDIAN_TEST_SQL = """
WITH c AS (SELECT event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
vg AS (SELECT v, CAST(SUM(n) AS BIGINT) AS n FROM c GROUP BY v),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM vg),
m AS (SELECT v AS med FROM
        (SELECT v, CAST(SUM(n) OVER (ORDER BY v) AS BIGINT) AS cum
         FROM vg) r CROSS JOIN t
      WHERE r.cum >= (t.nn + 1) // 2 ORDER BY v LIMIT 1),
g AS (SELECT c.event_type,
             CAST(SUM(CASE WHEN c.v > m.med THEN c.n ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(c.n) AS BIGINT) AS tot
      FROM c CROSS JOIN m GROUP BY c.event_type),
agg AS (SELECT CAST(SUM(a) AS BIGINT) AS aa,
               CAST(SUM(tot) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g),
k AS (SELECT CAST(SUM(
        CAST(floor((
          (CAST(g.a AS DOUBLE)
           - CAST(g.tot AS DOUBLE) * CAST(agg.aa AS DOUBLE)
             / CAST(agg.nn AS DOUBLE))
          * (CAST(g.a AS DOUBLE)
             - CAST(g.tot AS DOUBLE) * CAST(agg.aa AS DOUBLE)
               / CAST(agg.nn AS DOUBLE))
          / (CAST(g.tot AS DOUBLE) * CAST(agg.aa AS DOUBLE)
             / CAST(agg.nn AS DOUBLE))
          + (CAST(g.tot - g.a AS DOUBLE)
             - CAST(g.tot AS DOUBLE) * CAST(agg.nn - agg.aa AS DOUBLE)
               / CAST(agg.nn AS DOUBLE))
            * (CAST(g.tot - g.a AS DOUBLE)
               - CAST(g.tot AS DOUBLE) * CAST(agg.nn - agg.aa AS DOUBLE)
                 / CAST(agg.nn AS DOUBLE))
            / (CAST(g.tot AS DOUBLE) * CAST(agg.nn - agg.aa AS DOUBLE)
               / CAST(agg.nn AS DOUBLE))
        ) * 1000000 + 0.5005) AS BIGINT)) AS BIGINT) AS fold
      FROM g CROSS JOIN agg)
SELECT agg.nn AS n, m.med AS median_cents, agg.k, agg.aa AS n_above,
       floor(CAST(k.fold AS DOUBLE) / 1000000 * 1000000 + 0.5005)
         / 1000000 AS chi2
FROM k CROSS JOIN agg CROSS JOIN m
"""


def d_charclass(sf_dir: str):
    """Character-class profile per source — uppercase / digit /
    whitespace / non-ASCII fractions of the raw text, the cheap OCR-
    artifact and wrong-language smoke alarm that runs before any
    tokenizer. Per-class counts are exact integers from vectorized
    regex counts (pandas str.count per batch; SQL length-difference
    after regexp_replace), fractions quantize once each."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    CLS = {
        "upper": r"[A-Z]",
        "digit": r"[0-9]",
        "space": r"\s",
        "nonascii": r"[^\x00-\x7f]",
    }

    def cells(batch: pa.Table) -> pa.Table:
        t = pd.Series(batch["text"].to_numpy(zero_copy_only=False)).fillna("")
        df = pd.DataFrame({"source": batch["source"].to_pandas(),
                           "chars": t.str.len().to_numpy(np.int64)})
        for name, rx in CLS.items():
            df[name] = t.str.count(rx).to_numpy(np.int64)
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("chars", *CLS)])
        .to_pandas().sort_values("source")
    )
    out = {"source": g["source"], "chars": g["chars"].astype(np.int64)}
    tot = g["chars"].to_numpy(np.float64)
    for name in CLS:
        out[f"{name}_frac"] = _q6(g[name].to_numpy(np.float64) / tot)
    return pd.DataFrame(out).reset_index(drop=True)


D_CHARCLASS_SQL = """
WITH t AS (SELECT source, coalesce(text, '') AS s FROM documents),
c AS (SELECT source,
             CAST(SUM(length(s)) AS BIGINT) AS chars,
             CAST(SUM(length(s)
                      - length(regexp_replace(s, '[A-Z]', '', 'g')))
                  AS BIGINT) AS upper,
             CAST(SUM(length(s)
                      - length(regexp_replace(s, '[0-9]', '', 'g')))
                  AS BIGINT) AS digit,
             CAST(SUM(length(s)
                      - length(regexp_replace(s, '\\s', '', 'g')))
                  AS BIGINT) AS space,
             CAST(SUM(length(s)
                      - length(regexp_replace(s, '[^\\x00-\\x7f]', '', 'g')))
                  AS BIGINT) AS nonascii
      FROM t GROUP BY source)
SELECT source, chars,
       floor(CAST(upper AS DOUBLE) / CAST(chars AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS upper_frac,
       floor(CAST(digit AS DOUBLE) / CAST(chars AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS digit_frac,
       floor(CAST(space AS DOUBLE) / CAST(chars AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS space_frac,
       floor(CAST(nonascii AS DOUBLE) / CAST(chars AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS nonascii_frac
FROM c ORDER BY source
"""


def d_hash_collisions(sf_dir: str):
    """Collision audit of the dim-64 hashing-trick feature space: per
    bucket, how many DISTINCT vocabulary tokens share it (the same
    horner_mod61 % 64 mapping d_hash_features ships), plus the
    collision fraction — the number that says whether your hashed
    features are features or soup. The exchange is vocabulary-sized
    distinct hashes; the oracle re-derives every bucket through the
    same recursive HUGEINT power table."""
    from ..stages.text import horner_mod61

    DIM = 64
    ds = _read(sf_dir, "documents", columns=["text"])

    def cells(batch: pa.Table) -> pa.Table:
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        toks = pd.unique(ex.to_numpy(object))
        if not len(toks):
            return pa.table({"hv": pa.array([], pa.int64())})
        hv = np.unique(horner_mod61(list(toks)).astype(np.int64))
        return pa.table({"hv": pa.array(hv)})

    hv = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("hv").count()
        .to_pandas()["hv"].to_numpy(np.int64)
    )
    vocab = len(hv)
    bucket = hv % DIM
    loads = np.bincount(bucket, minlength=DIM)
    used = int((loads > 0).sum())
    colliding = int(loads[loads >= 2].sum())
    return pd.DataFrame({
        "dim": [DIM], "vocab": [vocab], "used_buckets": [used],
        "max_load": [int(loads.max())],
        "collision_frac": [float(_q6(np.float64(colliding)
                                     / np.float64(vocab)))],
    })


D_HASH_COLLISIONS_SQL = """
WITH RECURSIVE w AS (
  SELECT DISTINCT unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
    AS w
  FROM documents),
pw(k, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT k + 1, (v * 1000003) % 2305843009213693951 FROM pw
  WHERE k < (SELECT COALESCE(max(length(w)), 0) FROM w)),
ch AS (
  SELECT w, length(w) AS L,
         unnest(regexp_extract_all(w, '.')) AS c,
         generate_subscripts(regexp_extract_all(w, '.'), 1) AS j
  FROM w),
h AS (
  SELECT DISTINCT CAST(SUM(CAST(ord(c) AS HUGEINT) * pw.v)
                       % 2305843009213693951 AS BIGINT) AS hv
  FROM ch JOIN pw ON pw.k = L - j
  GROUP BY w),
loads AS (SELECT hv % 64 AS bucket, CAST(COUNT(*) AS BIGINT) AS load
          FROM h GROUP BY 1),
t AS (SELECT CAST((SELECT COUNT(*) FROM h) AS BIGINT) AS vocab,
             CAST(COUNT(*) AS BIGINT) AS used,
             CAST(MAX(load) AS BIGINT) AS max_load,
             CAST(SUM(CASE WHEN load >= 2 THEN load ELSE 0 END)
                  AS BIGINT) AS colliding
      FROM loads)
SELECT 64 AS dim, vocab, used AS used_buckets, max_load,
       floor(CAST(colliding AS DOUBLE) / CAST(vocab AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS collision_frac
FROM t
"""


def d_truncation_waste(sf_dir: str):
    """Context-length truncation audit: for L ∈ {32,64,128,256}, what
    fraction of the corpus's token mass survives truncating every
    document at L tokens, and how many documents get cut — the curve
    that picks a context length before you pay for one. One
    (token-count value) cell exchange; kept mass Σ min(n,L) folds as
    exact integers, fractions quantize once per L."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text"])

    def cells(batch: pa.Table) -> pa.Table:
        t = pd.Series(batch["text"].to_numpy(zero_copy_only=False)).fillna("")
        ntok = t.str.count(r"\S+").to_numpy(np.int64)
        df = pd.DataFrame({"v": ntok, "n": 1})
        return pa.Table.from_pandas(
            df.groupby("v", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values("v")
    )
    v = g["v"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    total_docs = int(cnt.sum())
    total_toks = int((v * cnt).sum())
    rows = []
    for L in (32, 64, 128, 256):
        kept = int((np.minimum(v, L) * cnt).sum())
        cut = int(cnt[v > L].sum())
        rows.append((L, total_docs, total_toks, kept, cut,
                     float(_q6(np.float64(kept) / np.float64(total_toks)))))
    return pd.DataFrame(
        rows,
        columns=["ctx_len", "n_docs", "total_tokens", "kept_tokens",
                 "docs_truncated", "kept_frac"],
    )


D_TRUNCATION_WASTE_SQL = """
WITH d AS (SELECT CAST(len(regexp_extract_all(coalesce(text, ''), '\\S+'))
                       AS BIGINT) AS v
           FROM documents),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(v) AS BIGINT) AS total FROM d),
ls AS (SELECT unnest([32, 64, 128, 256]) AS L)
SELECT ls.L AS ctx_len, t.n_docs, t.total AS total_tokens,
       (SELECT CAST(SUM(least(v, ls.L)) AS BIGINT) FROM d)
         AS kept_tokens,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d WHERE v > ls.L)
         AS docs_truncated,
       floor((SELECT CAST(SUM(least(v, ls.L)) AS DOUBLE) FROM d)
             / CAST(t.total AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS kept_frac
FROM ls CROSS JOIN t ORDER BY ctx_len
"""


def q_share_of_parent(sf_dir: str):
    """Two-level share-of-parent rollup: each (returnflag, linestatus)
    leaf's revenue as a fraction of its returnflag parent and of the
    grand total — the BI staple behind every treemap. Revenue folds as
    exact integer cents at the leaf; parent and grand totals are
    integer sums of leaves; each share is one quantized division."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "f": batch["l_returnflag"].to_pandas(),
            "s": batch["l_linestatus"].to_pandas(),
            "rev": np.floor(batch["l_extendedprice"].to_numpy() * 100
                            + 0.5).astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby(["f", "s"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["f", "s"]).aggregate(Sum("rev", alias_name="rev"))
        .to_pandas().sort_values(["f", "s"])
    )
    parent = g.groupby("f")["rev"].sum()
    total = int(g["rev"].sum())
    rows = []
    for _, r in g.iterrows():
        rev, par = int(r["rev"]), int(parent.loc[r["f"]])
        rows.append((r["f"], r["s"], rev, par,
                     float(_q6(np.float64(rev) / np.float64(par))),
                     float(_q6(np.float64(rev) / np.float64(total)))))
    return pd.DataFrame(
        rows,
        columns=["l_returnflag", "l_linestatus", "revenue_cents",
                 "parent_cents", "share_of_parent", "share_of_total"],
    ).reset_index(drop=True)


Q_SHARE_OF_PARENT_SQL = """
WITH leaf AS (SELECT l_returnflag AS f, l_linestatus AS s,
                     CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS rev
              FROM lineitem GROUP BY 1, 2),
p AS (SELECT f, CAST(SUM(rev) AS BIGINT) AS par FROM leaf GROUP BY f),
t AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM leaf)
SELECT leaf.f AS l_returnflag, leaf.s AS l_linestatus,
       leaf.rev AS revenue_cents, p.par AS parent_cents,
       floor(CAST(leaf.rev AS DOUBLE) / CAST(p.par AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS share_of_parent,
       floor(CAST(leaf.rev AS DOUBLE) / CAST(t.total AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS share_of_total
FROM leaf JOIN p USING (f) CROSS JOIN t ORDER BY 1, 2
"""


def t_xcorr(sf_dir: str):
    """Lead–lag cross-correlation between the click and purchase
    hourly series at lags −3…+3: every lagged cross-covariance clears
    its means through the n²-scaling identity (n²·Σxy_k − n·Sy·Xhead −
    n·Sx·Ytail + m·Sx·Sy — all exact integers), normalizes by the two
    exact full-series variances, and quantizes once per lag. The 'do
    purchases follow clicks, and by how many hours' answer with no
    float accumulation."""
    from ray.data.aggregate import Max, Min, Sum

    ts = _read(sf_dir, "events", columns=["ts"])
    mm = ts.aggregate(Min("ts"), Max("ts"))
    lo = int(np.datetime64(mm["min(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    hi = int(np.datetime64(mm["max(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    H = hi - lo + 1

    ds = _read(sf_dir, "events", columns=["event_type", "ts"],
               where=(pc.field("event_type") == "click")
               | (pc.field("event_type") == "purchase"))

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "h": (us // 3_600_000_000).astype(np.int64), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["event_type", "h"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "h"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    def dense(et):
        y = np.zeros(H, np.int64)
        gg = g[g["event_type"] == et]
        y[gg["h"].to_numpy(np.int64) - lo] = gg["n"].to_numpy(np.int64)
        return y

    x, y = dense("click"), dense("purchase")
    n = H
    Sx, Sy = int(x.sum()), int(y.sum())
    cxx = n * n * int((x * x).sum()) - n * Sx * Sx
    cyy = n * n * int((y * y).sum()) - n * Sy * Sy
    rows = []
    for k in range(-3, 4):
        if k >= 0:
            a, b = x[:n - k], y[k:]
        else:
            a, b = x[-k:], y[:n + k]
        m = len(a)
        pk = int((a * b).sum())
        ck = n * n * pk - n * Sy * int(a.sum()) - n * Sx * int(b.sum()) \
            + m * Sx * Sy
        r = float(_q6(np.float64(ck)
                      / np.sqrt(np.float64(cxx) * np.float64(cyy))))
        rows.append((k, m, r))
    return pd.DataFrame(rows, columns=["lag", "n_overlap", "r"])


T_XCORR_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
cx AS (SELECT epoch_us(ts) // 3600000000 AS h,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM events WHERE event_type = 'click' GROUP BY 1),
cy AS (SELECT epoch_us(ts) // 3600000000 AS h,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM events WHERE event_type = 'purchase' GROUP BY 1),
x AS (SELECT grid.h, COALESCE(cx.n, 0) AS n
      FROM grid LEFT JOIN cx USING (h)),
y AS (SELECT grid.h, COALESCE(cy.n, 0) AS n
      FROM grid LEFT JOIN cy USING (h)),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
             CAST((SELECT SUM(n) FROM x) AS HUGEINT) AS sx,
             CAST((SELECT SUM(n) FROM y) AS HUGEINT) AS sy,
             CAST((SELECT SUM(CAST(n AS HUGEINT) * n) FROM x)
                  AS HUGEINT) AS px2,
             CAST((SELECT SUM(CAST(n AS HUGEINT) * n) FROM y)
                  AS HUGEINT) AS py2
      FROM x),
lags AS (SELECT unnest(generate_series(-3, 3)) AS k),
pk AS (SELECT lags.k,
              CAST(COUNT(*) AS HUGEINT) AS m,
              CAST(SUM(CAST(a.n AS HUGEINT) * bb.n) AS HUGEINT) AS p,
              CAST(SUM(a.n) AS HUGEINT) AS ah,
              CAST(SUM(bb.n) AS HUGEINT) AS bt
       FROM lags JOIN x a ON TRUE JOIN y bb ON bb.h = a.h + lags.k
       GROUP BY lags.k)
SELECT pk.k AS lag, CAST(pk.m AS BIGINT) AS n_overlap,
       floor(CAST(t.nn * t.nn * pk.p - t.nn * t.sy * pk.ah
                  - t.nn * t.sx * pk.bt + pk.m * t.sx * t.sy AS DOUBLE)
             / sqrt(CAST(t.nn * t.nn * t.px2 - t.nn * t.sx * t.sx
                         AS DOUBLE)
                    * CAST(t.nn * t.nn * t.py2 - t.nn * t.sy * t.sy
                           AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS r
FROM pk CROSS JOIN t ORDER BY lag
"""


def q_ratio_delta(sf_dir: str):
    """Ratio-metric A/B test with the delta method — revenue per
    event compared between odd and even users, the experimentation-
    platform workhorse naive per-row t-tests get wrong. Per-user
    (revenue cents, event count) pairs reduce through one entity
    exchange into five exact integer moments per arm; the linearized
    variance (var x + R²·var y − 2R·cov)/ (n·ȳ²) evaluates from
    token-identical doubles; each arm's ratio and the z quantize
    once."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def peruser(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "x": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "y": 1,
        })
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).sum(),
            preserve_index=False)

    u = (
        ds.map_batches(peruser, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"), Sum("y", alias_name="y"))
        .to_pandas()
    )
    u["treat"] = u["user_id"].to_numpy(np.int64) % 2 == 1

    def arm(t):
        g = u[u["treat"] == t]
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        n = len(g)
        Sx, Sy = int(x.sum()), int(y.sum())
        Sxx = int((x.astype(object) * x.astype(object)).sum())
        Syy = int((y.astype(object) * y.astype(object)).sum())
        Sxy = int((x.astype(object) * y.astype(object)).sum())
        nf = np.float64(n)
        R = np.float64(Sx) / np.float64(Sy)
        ybar = np.float64(Sy) / nf
        vx = (np.float64(Sxx) - np.float64(Sx) * np.float64(Sx) / nf) \
            / (nf - 1.0)
        vy = (np.float64(Syy) - np.float64(Sy) * np.float64(Sy) / nf) \
            / (nf - 1.0)
        cxy = (np.float64(Sxy) - np.float64(Sx) * np.float64(Sy) / nf) \
            / (nf - 1.0)
        var_r = (vx + R * R * vy - 2.0 * R * cxy) / (nf * ybar * ybar)
        return n, R, var_r

    n_c, r_c, v_c = arm(False)
    n_t, r_t, v_t = arm(True)
    z = float(_q6((r_t - r_c) / np.sqrt(v_t + v_c)))
    return pd.DataFrame({
        "n_users_c": [n_c], "n_users_t": [n_t],
        "ratio_c": [float(_q6(r_c / 100.0))],
        "ratio_t": [float(_q6(r_t / 100.0))],
        "z": [z],
    })


Q_RATIO_DELTA_SQL = """
WITH u AS (SELECT user_id, user_id % 2 = 1 AS treat,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS x,
                  CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY user_id),
m AS (SELECT treat,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM u GROUP BY treat),
e AS (SELECT treat, n,
             CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
             (CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vx,
             (CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vy,
             (CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cxy
      FROM m),
v AS (SELECT treat, n, r,
             (vx + r * r * vy - 2.0 * r * cxy)
               / (CAST(n AS DOUBLE) * ybar * ybar) AS var_r
      FROM e)
SELECT c.n AS n_users_c, t.n AS n_users_t,
       floor(c.r / 100.0 * 1000000 + 0.5005) / 1000000 AS ratio_c,
       floor(t.r / 100.0 * 1000000 + 0.5005) / 1000000 AS ratio_t,
       floor((t.r - c.r) / sqrt(t.var_r + c.var_r)
             * 1000000 + 0.5005) / 1000000 AS z
FROM (SELECT * FROM v WHERE NOT treat) c
CROSS JOIN (SELECT * FROM v WHERE treat) t
"""


def t_sprt(sf_dir: str):
    """Wald's sequential probability ratio test replayed over the
    event stream in (ts, event_id) order: is the purchase rate 0.2
    (H1) rather than 0.1 (H0)? The two per-event log-likelihood
    increments are CONSTANTS, micro-quantized once, so the running
    LLR is an exact integer walk over cumulative counts and the first
    boundary crossing (±ln 19, α=β=0.05) is a pure integer
    comparison — the early-stopping monitor that reads a stream once
    and stops the moment the evidence suffices. The ordered walk runs
    driver-side at test scale; at 100 TB the crossing localizes to an
    hour bucket via per-hour (n, k) cells (the LLR at a bucket
    boundary is a·k + b·(n−k), monotone between refills) and one
    filtered hour read refines — the t_time_split two-pass shape."""
    P0, P1 = 0.1, 0.2
    a_mic = int(np.floor(np.log(P1 / P0) * 1e6 + 0.5005))        # hit
    b_mic = int(np.floor(np.log((1 - P1) / (1 - P0)) * 1e6 + 0.5005))
    bound = int(np.floor(np.log(19.0) * 1e6 + 0.5005))

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    rows = ds.select_columns(["event_id", "ts", "event_type"]).to_pandas()
    us = rows["ts"].to_numpy("datetime64[us]").astype(np.int64)
    order = np.lexsort((rows["event_id"].to_numpy(np.int64), us))
    hit = (rows["event_type"].to_numpy(object)[order] == "purchase") \
        .astype(np.int64)
    llr = np.cumsum(np.where(hit == 1, a_mic, b_mic))
    crossed = np.nonzero((llr >= bound) | (llr <= -bound))[0]
    if len(crossed):
        i = int(crossed[0])
        decision = "accept_h1" if llr[i] >= bound else "accept_h0"
    else:
        i = len(llr) - 1
        decision = "continue"
    return pd.DataFrame({
        "decision": [decision], "n_at_decision": [i + 1],
        "k_at_decision": [int(hit[:i + 1].sum())],
        "llr": [int(llr[i]) / 1e6],
    })


T_SPRT_SQL = """
WITH k AS (SELECT CAST(floor(ln(0.2 / 0.1) * 1000000 + 0.5005)
                       AS BIGINT) AS a,
                  CAST(floor(ln(0.8 / 0.9) * 1000000 + 0.5005)
                       AS BIGINT) AS b,
                  CAST(floor(ln(19.0) * 1000000 + 0.5005) AS BIGINT)
                    AS bound),
o AS (SELECT event_type = 'purchase' AS hit,
             ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) AS rk
      FROM events),
w AS (SELECT o.rk, o.hit,
             CAST(SUM(CASE WHEN o.hit THEN k.a ELSE k.b END)
                  OVER (ORDER BY o.rk) AS BIGINT) AS llr,
             CAST(SUM(CASE WHEN o.hit THEN 1 ELSE 0 END)
                  OVER (ORDER BY o.rk) AS BIGINT) AS kk
      FROM o CROSS JOIN k),
x AS (SELECT w.rk, w.llr, w.kk,
             CASE WHEN w.llr >= k.bound THEN 'accept_h1'
                  WHEN w.llr <= -k.bound THEN 'accept_h0' END AS dec
      FROM w CROSS JOIN k),
hitrow AS (SELECT * FROM x WHERE dec IS NOT NULL ORDER BY rk LIMIT 1),
lastrow AS (SELECT rk, llr, kk, 'continue' AS dec FROM x
            ORDER BY rk DESC LIMIT 1)
SELECT COALESCE(h.dec, l.dec) AS decision,
       CAST(COALESCE(h.rk, l.rk) AS BIGINT) AS n_at_decision,
       COALESCE(h.kk, l.kk) AS k_at_decision,
       COALESCE(h.llr, l.llr) / 1000000.0 AS llr
FROM lastrow l LEFT JOIN hitrow h ON TRUE
"""


def d_dup_threshold_curve(sf_dir: str):
    """Dedup yield curve: how many of the adjacent-pair candidates
    (the d_jaccard convention) survive at each Jaccard threshold τ ∈
    {0.1…0.9} — the knob-setting plot that turns 'pick a threshold'
    into a measured trade-off. Reuses the exact pair similarities;
    τ comparisons run against the 6dp-quantized values BOTH engines
    share, so boundary pairs cannot flip."""
    pairs = d_jaccard(sf_dir).to_pandas()
    j = pairs["jaccard"].to_numpy(np.float64)
    n = len(j)
    rows = []
    for t10 in range(1, 10):
        tau = t10 / 10.0
        kept = int((j >= tau).sum())
        rows.append((float(tau), n, kept,
                     float(_q6(np.float64(kept) / np.float64(n)))))
    return pd.DataFrame(
        rows, columns=["tau", "n_pairs", "n_dup", "dup_frac"])


D_DUP_THRESHOLD_CURVE_SQL = """
WITH docs AS (
  SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\\S+') AS w
  FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.w AS wa, b.w AS wb
  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 50 = 0
), g AS (
  SELECT a_id,
    list_distinct(list_transform(generate_series(1, greatest(len(wa) - 2, 0)),
        i -> wa[i] || ' ' || wa[i+1] || ' ' || wa[i+2])) AS ga,
    list_distinct(list_transform(generate_series(1, greatest(len(wb) - 2, 0)),
        i -> wb[i] || ' ' || wb[i+1] || ' ' || wb[i+2])) AS gb
  FROM pairs
), jj AS (
  SELECT round(CASE WHEN len(ga) = 0 AND len(gb) = 0 THEN 1.0
               ELSE len(list_intersect(ga, gb)) * 1.0
                    / greatest(len(list_distinct(ga || gb)), 1) END, 6)
           AS j
  FROM g
), taus AS (SELECT unnest(generate_series(1, 9)) AS t10)
SELECT t10 / 10.0 AS tau,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM jj) AS n_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM jj WHERE j >= t10 / 10.0)
         AS n_dup,
       floor((SELECT CAST(COUNT(*) AS DOUBLE) FROM jj
              WHERE j >= t10 / 10.0)
             / (SELECT CAST(COUNT(*) AS DOUBLE) FROM jj)
             * 1000000 + 0.5005) / 1000000 AS dup_frac
FROM taus ORDER BY tau
"""


def q_cohens_d(sf_dir: str):
    """Cohen's d effect size between odd- and even-user event values:
    per-arm n/Σ/Σ² fold exactly, the pooled standard deviation and d
    evaluate from token-identical doubles, and d quantizes once — the
    practical-significance companion to the z/U tests (a tiny p-value
    with d≈0 is a big-data artifact, not an effect)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "treat": (batch["user_id"].to_numpy() % 2 == 1),
            "n": 1, "s": c, "q": c * c,
        })
        return pa.Table.from_pandas(
            df.groupby("treat", as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("treat")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("q", alias_name="q"))
        .to_pandas().set_index("treat")
    )

    def arm(t):
        n = np.float64(int(g.loc[t, "n"]))
        s = np.float64(int(g.loc[t, "s"]))
        q = np.float64(int(g.loc[t, "q"]))
        return n, s / n, (q - s * s / n) / (n - 1.0)

    n0, m0, v0 = arm(False)
    n1, m1, v1 = arm(True)
    sp = np.sqrt(((n1 - 1.0) * v1 + (n0 - 1.0) * v0) / (n1 + n0 - 2.0))
    return pd.DataFrame({
        "n_c": [int(n0)], "n_t": [int(n1)],
        "mean_c": [float(_q6(m0 / 100.0))],
        "mean_t": [float(_q6(m1 / 100.0))],
        "cohens_d": [float(_q6((m1 - m0) / sp))],
    })


Q_COHENS_D_SQL = """
WITH g AS (SELECT user_id % 2 = 1 AS treat,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS s,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                           * CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS q
           FROM events GROUP BY 1),
e AS (SELECT treat, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             (CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0) AS v
      FROM g)
SELECT c.n AS n_c, t.n AS n_t,
       floor(c.m / 100.0 * 1000000 + 0.5005) / 1000000 AS mean_c,
       floor(t.m / 100.0 * 1000000 + 0.5005) / 1000000 AS mean_t,
       floor((t.m - c.m)
             / sqrt(((CAST(t.n AS DOUBLE) - 1.0) * t.v
                     + (CAST(c.n AS DOUBLE) - 1.0) * c.v)
                    / (CAST(t.n AS DOUBLE) + CAST(c.n AS DOUBLE) - 2.0))
             * 1000000 + 0.5005) / 1000000 AS cohens_d
FROM (SELECT * FROM e WHERE NOT treat) c
CROSS JOIN (SELECT * FROM e WHERE treat) t
"""


def d_c4_funnel(sf_dir: str):
    """Rule-attribution funnel for the C4 filter: survivors after each
    successive rule (word count → mean word length → brace → lorem),
    cumulatively — the decomposition d_c4_filter's aggregate hides,
    and the first thing you read when a filter eats 40% of a crawl.
    One map_batches computes all four cumulative masks per batch (the
    same vectorized expressions stages/text.py:c4_keep_mask ships);
    the exchange is five counters."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text"])

    def cells(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pandas()).fillna("")
        n_words = s.str.count(r"\S+").to_numpy(np.int64)
        nonws = s.str.replace(r"\s+", "", regex=True).str.len() \
            .to_numpy(np.int64)
        m1 = (n_words >= 30) & (n_words <= 10000)
        m2 = m1 & (nonws / np.maximum(n_words, 1) <= 4.6)
        m3 = m2 & ~s.str.contains("{", regex=False).to_numpy()
        m4 = m3 & ~s.str.lower().str.contains("lorem ipsum",
                                              regex=False).to_numpy()
        return pa.table({
            "total": pa.array([len(s)]),
            "word_count": pa.array([int(m1.sum())]),
            "mean_wl": pa.array([int(m2.sum())]),
            "brace": pa.array([int(m3.sum())]),
            "lorem": pa.array([int(m4.sum())]),
        })

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .sum(["total", "word_count", "mean_wl", "brace", "lorem"])
    )
    total = int(g["sum(total)"])
    rows = []
    for i, stage in enumerate(("word_count", "mean_wl", "brace", "lorem"),
                              start=1):
        kept = int(g[f"sum({stage})"])
        rows.append((i, stage, kept,
                     float(_q6(np.float64(kept) / np.float64(total)))))
    return pd.DataFrame(
        rows, columns=["stage_idx", "stage", "n_pass", "pass_frac"])


D_C4_FUNNEL_SQL = """
WITH d AS (
  SELECT length(regexp_extract_all(coalesce(text, ''), '\\S+')) AS nw,
         length(regexp_replace(coalesce(text, ''), '\\s+', '', 'g'))
           AS nonws,
         position('{' IN coalesce(text, '')) = 0 AS nobrace,
         position('lorem ipsum' IN lower(coalesce(text, ''))) = 0
           AS nolorem
  FROM documents),
m AS (SELECT nw BETWEEN 30 AND 10000 AS m1,
             nw BETWEEN 30 AND 10000
               AND nonws / greatest(nw, 1) <= 4.6 AS m2,
             nw BETWEEN 30 AND 10000
               AND nonws / greatest(nw, 1) <= 4.6 AND nobrace AS m3,
             nw BETWEEN 30 AND 10000
               AND nonws / greatest(nw, 1) <= 4.6 AND nobrace
               AND nolorem AS m4
      FROM d),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
             CAST(COUNT(*) FILTER (m1) AS BIGINT) AS s1,
             CAST(COUNT(*) FILTER (m2) AS BIGINT) AS s2,
             CAST(COUNT(*) FILTER (m3) AS BIGINT) AS s3,
             CAST(COUNT(*) FILTER (m4) AS BIGINT) AS s4
      FROM m)
SELECT u.stage_idx, u.stage, u.n_pass,
       floor(CAST(u.n_pass AS DOUBLE) / CAST(t.total AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS pass_frac
FROM t, (SELECT 1 AS stage_idx, 'word_count' AS stage, t2.s1 AS n_pass
         FROM t t2
         UNION ALL SELECT 2, 'mean_wl', t2.s2 FROM t t2
         UNION ALL SELECT 3, 'brace', t2.s3 FROM t t2
         UNION ALL SELECT 4, 'lorem', t2.s4 FROM t t2) u
ORDER BY u.stage_idx
"""


def q_key_audit(sf_dir: str):
    """Primary-key uniqueness audit of lineitem's (l_orderkey,
    l_linenumber): duplicate key pairs, rows involved, and the worst
    multiplicity — the data-quality check that catches a double-loaded
    partition before it double-counts revenue (this fixture really
    does carry ~2% duplicate keys). Per-batch key-count partials keep
    the exchange at one row per (batch, key); the combine is a driver
    pandas fold (keys are near-unique, so a Ray groupby sort-shuffled
    essentially every row — 8.9s at sf0.1 where this takes ~1); the
    verdict is pure integer counting."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch["l_orderkey"].to_numpy().astype(np.int64) * 16
            + batch["l_linenumber"].to_numpy().astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby("k", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("k", as_index=False)["n"].sum()
    )
    n = g["n"].to_numpy(np.int64)
    total = int(n.sum())
    dup_keys = int((n > 1).sum())
    dup_rows = int(n[n > 1].sum())
    return pd.DataFrame({
        "n_rows": [total], "n_keys": [len(g)],
        "dup_keys": [dup_keys], "dup_rows": [dup_rows],
        "max_multiplicity": [int(n.max())],
        "dup_frac": [float(_q6(np.float64(dup_rows) / np.float64(total)))],
    })


Q_KEY_AUDIT_SQL = """
WITH k AS (SELECT l_orderkey * 16 + l_linenumber AS k,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(COUNT(*) FILTER (n > 1) AS BIGINT) AS dup_keys,
             CAST(COALESCE(SUM(n) FILTER (n > 1), 0) AS BIGINT)
               AS dup_rows,
             CAST(MAX(n) AS BIGINT) AS max_multiplicity
      FROM k)
SELECT n_rows, n_keys, dup_keys, dup_rows, max_multiplicity,
       floor(CAST(dup_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS dup_frac
FROM t
"""


def q_pearson_residuals(sf_dir: str):
    """Adjusted (standardized) Pearson residuals for every cell of the
    lang×source contingency table — the drill-down that says WHICH
    cell drives the association Cramér's V only summarizes. Expected
    counts and the (1−r/n)(1−c/n) adjustment are rationals of exact
    marginals evaluated as token-identical doubles; each residual
    quantizes once. Cells with |z| ≥ 2 are flagged."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch["lang"].to_pandas(),
            "source": batch["source"].to_pandas(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["lang", "source"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "source"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = g.pivot_table(index="lang", columns="source", values="n",
                        fill_value=0, aggfunc="sum").sort_index()
    piv = piv[sorted(piv.columns)]
    o = piv.to_numpy(np.int64)
    row = o.sum(axis=1)
    col = o.sum(axis=0)
    n = int(o.sum())
    rows = []
    for i, lang in enumerate(piv.index):
        for j, src in enumerate(piv.columns):
            e = np.float64(int(row[i])) * np.float64(int(col[j])) \
                / np.float64(n)
            adj = (1.0 - np.float64(int(row[i])) / np.float64(n)) \
                * (1.0 - np.float64(int(col[j])) / np.float64(n))
            z = float(_q6((np.float64(int(o[i, j])) - e)
                          / np.sqrt(e * adj)))
            rows.append((lang, src, int(o[i, j]), float(_q6(e)), z,
                         abs(z) >= 2.0))
    return pd.DataFrame(
        rows,
        columns=["lang", "source", "observed", "expected", "z",
                 "flagged"],
    )


Q_PEARSON_RESIDUALS_SQL = """
WITH o AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY lang, source),
rl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS r FROM o GROUP BY lang),
cl AS (SELECT source, CAST(SUM(n) AS BIGINT) AS c FROM o GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM o),
grid AS (SELECT rl.lang, cl.source, rl.r, cl.c, COALESCE(o.n, 0) AS n
         FROM rl CROSS JOIN cl
         LEFT JOIN o ON o.lang = rl.lang AND o.source = cl.source),
e AS (SELECT g.lang, g.source, g.n,
             CAST(g.r AS DOUBLE) * CAST(g.c AS DOUBLE)
               / CAST(t.nn AS DOUBLE) AS ex,
             (1.0 - CAST(g.r AS DOUBLE) / CAST(t.nn AS DOUBLE))
               * (1.0 - CAST(g.c AS DOUBLE) / CAST(t.nn AS DOUBLE)) AS adj
      FROM grid g CROSS JOIN t),
z AS (SELECT lang, source, n AS observed,
             floor(ex * 1000000 + 0.5005) / 1000000 AS expected,
             floor((CAST(n AS DOUBLE) - ex) / sqrt(ex * adj)
                   * 1000000 + 0.5005) / 1000000 AS z
      FROM e)
SELECT lang, source, observed, expected, z, abs(z) >= 2.0 AS flagged
FROM z ORDER BY lang, source
"""


def q_cvar(sf_dir: str):
    """Expected shortfall (CVaR) of hourly net event value at the 5%
    tail: the mean of the worst k = ⌊n·5/100⌋ hourly cent sums, via
    exact rank interval arithmetic over the hourly value cells (a
    cell straddling the tail cut contributes its kept multiplicity) —
    the coherent risk metric VaR isn't, with zero float until the one
    division. Also reports VaR (the k-th worst hour, an exact
    element)."""
    y = _hourly_value_cents(sf_dir)
    n = len(y)
    k = n * 5 // 100
    ys = np.sort(y)
    var = int(ys[k - 1]) if k >= 1 else int(ys[0])
    tail_sum = int(ys[:k].sum()) if k >= 1 else int(ys[0])
    kk = max(k, 1)
    return pd.DataFrame({
        "n_hours": [n], "k_tail": [k],
        "var_cents": [var],
        "cvar_cents": [float(_q6(np.float64(tail_sum) / np.float64(kk)))],
    })


def _hourly_value_cents(sf_dir: str):
    """Dense hourly net value (exact integer cents) — the value-sum
    sibling of _dense_hourly_counts."""
    from ray.data.aggregate import Max, Min, Sum

    ts = _read(sf_dir, "events", columns=["ts"])
    mm = ts.aggregate(Min("ts"), Max("ts"))
    lo = int(np.datetime64(mm["min(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    hi = int(np.datetime64(mm["max(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    H = hi - lo + 1
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "h": (us // 3_600_000_000).astype(np.int64),
            "s": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("s", alias_name="s"))
        .to_pandas()
    )
    y = np.zeros(H, np.int64)
    y[g["h"].to_numpy(np.int64) - lo] = g["s"].to_numpy(np.int64)
    return y


Q_CVAR_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS s
      FROM events GROUP BY 1),
y AS (SELECT grid.h, COALESCE(c.s, 0) AS s FROM grid LEFT JOIN c USING (h)),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) * 5 // 100 AS k
      FROM y),
r AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rk FROM y)
SELECT t.n AS n_hours, t.k AS k_tail,
       (SELECT s FROM r WHERE rk = greatest(t.k, 1)) AS var_cents,
       floor((SELECT CAST(SUM(s) AS DOUBLE) FROM r
              WHERE rk <= greatest(t.k, 1))
             / CAST(greatest(t.k, 1) AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS cvar_cents
FROM t
"""


def d_ngram_overlap_curve(sf_dir: str):
    """Memorization-risk curve: for n = 1, 2, 3, the overlap between
    the DISTINCT word-n-gram sets of the odd- and even-doc_id halves —
    unigrams always overlap, long n-grams shouldn't; where the curve
    stops falling is where your 'held-out' half stops being held out.
    Grams build vectorized from the flat word stream (starts whose
    (n−1)-th successor is still in the same doc, np.char.add over
    shifted slices — no per-doc Python); per-batch dedup keeps the
    exchange near vocabulary-sized; overlap fractions quantize once."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = pd.Series(batch["text"].to_numpy(zero_copy_only=False)) \
            .fillna("")
        ex = texts.str.findall(r"\S+").explode().dropna()
        if not len(ex):
            return pa.table({"n": pa.array([], pa.int64()),
                             "half": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string())})
        row_of = ex.index.to_numpy(np.int64)
        words = ex.to_numpy(object).astype(str)
        half = (ids[row_of] % 2).astype(np.int64)
        frames = []
        for n in (1, 2, 3):
            W = len(words)
            if W < n:
                continue
            ok = row_of[: W - n + 1] == row_of[n - 1:]
            gram = words[: W - n + 1].copy()
            for j in range(1, n):
                gram = np.char.add(np.char.add(gram, " "),
                                   words[j: W - n + 1 + j])
            frames.append(pd.DataFrame({
                "n": n, "half": half[: W - n + 1][ok], "gram": gram[ok],
            }).drop_duplicates())
        df = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    # driver drop_duplicates instead of a 3-column Ray groupby over
    # near-unique gram strings (the multi-key-groupby trap: 5.6s at
    # sf0.1 where this takes ~2); per-batch dedup already shrank the
    # stream
    v = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    rows = []
    for n, g in v.groupby("n"):
        a = set(g.loc[g["half"] == 0, "gram"])
        b = set(g.loc[g["half"] == 1, "gram"])
        inter = len(a & b)
        rows.append((int(n), len(a), len(b), inter,
                     float(_q6(np.float64(inter) / np.float64(len(a)))),
                     float(_q6(np.float64(inter) / np.float64(len(b))))))
    return pd.DataFrame(
        rows,
        columns=["n", "v_even", "v_odd", "overlap", "frac_even",
                 "frac_odd"],
    )


D_NGRAM_OVERLAP_CURVE_SQL = """
WITH w AS (SELECT doc_id % 2 AS half,
                  regexp_extract_all(coalesce(text, ''), '\\S+') AS ws
           FROM documents),
g AS (
  SELECT 1 AS n, half, unnest(ws) AS gram FROM w
  UNION ALL
  SELECT 2, half,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                i -> ws[i] || ' ' || ws[i+1]))
  FROM w
  UNION ALL
  SELECT 3, half,
         unnest(list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
  FROM w),
v AS (SELECT DISTINCT n, half, gram FROM g),
s AS (SELECT n,
             CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS v_even,
             CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS v_odd
      FROM v GROUP BY n),
ov AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS overlap
       FROM (SELECT n, gram FROM v GROUP BY n, gram HAVING COUNT(*) = 2)
       GROUP BY n)
SELECT s.n, s.v_even, s.v_odd, ov.overlap,
       floor(CAST(ov.overlap AS DOUBLE) / CAST(s.v_even AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS frac_even,
       floor(CAST(ov.overlap AS DOUBLE) / CAST(s.v_odd AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS frac_odd
FROM s JOIN ov USING (n) ORDER BY s.n
"""


def q_welch_t(sf_dir: str):
    """Welch's unequal-variance t between odd- and even-user event
    values, with the Welch–Satterthwaite degrees of freedom — the
    default two-sample test when nobody promised equal variances.
    Exact per-arm power sums; t and ν evaluate from token-identical
    doubles and quantize once each."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "treat": (batch["user_id"].to_numpy() % 2 == 1),
            "n": 1, "s": c, "q": c * c,
        })
        return pa.Table.from_pandas(
            df.groupby("treat", as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("treat")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("q", alias_name="q"))
        .to_pandas().set_index("treat")
    )

    def arm(t):
        n = np.float64(int(g.loc[t, "n"]))
        s = np.float64(int(g.loc[t, "s"]))
        q = np.float64(int(g.loc[t, "q"]))
        v = (q - s * s / n) / (n - 1.0)
        return n, s / n, v / n

    n0, m0, se0 = arm(False)
    n1, m1, se1 = arm(True)
    t = (m1 - m0) / np.sqrt(se1 + se0)
    nu = (se1 + se0) * (se1 + se0) \
        / (se1 * se1 / (n1 - 1.0) + se0 * se0 / (n0 - 1.0))
    return pd.DataFrame({
        "n_c": [int(n0)], "n_t": [int(n1)],
        "t_stat": [float(_q6(t))], "df": [float(_q6(nu))],
    })


Q_WELCH_T_SQL = """
WITH g AS (SELECT user_id % 2 = 1 AS treat,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS s,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                           * CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS q
           FROM events GROUP BY 1),
e AS (SELECT treat, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             ((CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1.0)) / CAST(n AS DOUBLE) AS se
      FROM g)
SELECT c.n AS n_c, t.n AS n_t,
       floor((t.m - c.m) / sqrt(t.se + c.se) * 1000000 + 0.5005)
         / 1000000 AS t_stat,
       floor((t.se + c.se) * (t.se + c.se)
             / (t.se * t.se / (CAST(t.n AS DOUBLE) - 1.0)
                + c.se * c.se / (CAST(c.n AS DOUBLE) - 1.0))
             * 1000000 + 0.5005) / 1000000 AS df
FROM (SELECT * FROM e WHERE NOT treat) c
CROSS JOIN (SELECT * FROM e WHERE treat) t
"""


def q_hhi(sf_dir: str):
    """Herfindahl–Hirschman revenue concentration across customers:
    HHI = Σ(shareᵢ)² over per-customer revenue, computed as ONE exact
    integer ratio Σrevᵢ² / (Σrev)² — no per-customer share float ever
    exists — plus the effective customer count 1/HHI. Per-customer
    revenue reduces through one entity exchange (orders already carry
    o_totalprice; exact cents)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": batch["o_custkey"].to_numpy(),
            "rev": np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("o_custkey", as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    rev = [int(r) for r in g["rev"]]
    total = sum(rev)
    sq = sum(r * r for r in rev)
    hhi = _q6(np.float64(sq) / (np.float64(total) * np.float64(total)))
    return pd.DataFrame({
        "n_customers": [len(rev)],
        "total_cents": [total],
        "hhi": [float(hhi)],
        "effective_n": [float(_q6(1.0 / hhi)) if hhi > 0 else 0.0],
    })


Q_HHI_SQL = """
WITH c AS (SELECT o_custkey,
                  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                AS BIGINT)) AS BIGINT) AS rev
           FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS HUGEINT) AS total,
             CAST(SUM(CAST(rev AS HUGEINT) * rev) AS HUGEINT) AS sq
      FROM c),
h AS (SELECT n, total,
             floor(CAST(sq AS DOUBLE)
                   / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
                   * 1000000 + 0.5005) / 1000000 AS hhi
      FROM t)
SELECT n AS n_customers, CAST(total AS BIGINT) AS total_cents, hhi,
       CASE WHEN hhi > 0
            THEN floor(1.0 / hhi * 1000000 + 0.5005) / 1000000
            ELSE 0.0 END AS effective_n
FROM h
"""


def t_hour_entropy(sf_dir: str):
    """Behavioral-regularity score per user: Shannon entropy (nats) of
    the user's hour-of-day activity histogram, normalized by ln 24 —
    0 means a bot that fires at one fixed hour, 1 means uniformly
    spread activity. One (user, hour) count exchange; each −p·ln p
    term micro-floors from exact counts (the d_mix_entropy fold at
    entity grain), one quantized division per user."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "hr": ((us // 3_600_000_000) % 24).astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["user_id", "hr"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["user_id", "hr"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for uid, grp in g.groupby("user_id"):
        n = grp["n"].to_numpy(np.int64)
        N = int(n.sum())
        p = n.astype(np.float64) / np.float64(N)
        fold = int(np.floor(-p * np.log(p) * 1e6 + 0.5005)
                   .astype(np.int64).sum())
        h = _q6(np.float64(fold) / 1e6)
        rows.append((int(uid), N, len(n), float(h),
                     float(_q6(h / np.log(np.float64(24.0))))))
    return pd.DataFrame(
        rows,
        columns=["user_id", "n_events", "n_hours_used", "entropy",
                 "regularity"],
    ).sort_values("user_id").reset_index(drop=True)


T_HOUR_ENTROPY_SQL = """
WITH c AS (SELECT user_id, (epoch_us(ts) // 3600000000) % 24 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
t AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS hrs
      FROM c GROUP BY user_id),
m AS (SELECT c.user_id,
             CAST(SUM(CAST(floor(-(c.n / CAST(t.nn AS DOUBLE))
                                 * ln(c.n / CAST(t.nn AS DOUBLE))
                                 * 1000000 + 0.5005) AS BIGINT))
                  AS BIGINT) AS fold
      FROM c JOIN t USING (user_id) GROUP BY c.user_id),
e AS (SELECT m.user_id, t.nn, t.hrs,
             floor(CAST(m.fold AS DOUBLE) / 1000000
                   * 1000000 + 0.5005) / 1000000 AS entropy
      FROM m JOIN t USING (user_id))
SELECT user_id, nn AS n_events, hrs AS n_hours_used, entropy,
       floor(entropy / ln(24.0) * 1000000 + 0.5005) / 1000000
         AS regularity
FROM e ORDER BY user_id
"""


def q_tukey_fences(sf_dir: str):
    """Tukey-fence outlier census of price per returnflag: quartiles
    are exact ELEMENTS (the q_bowley rank selection), and the 1.5·IQR
    fences compare as PURE INTEGERS — a value is an outlier iff
    2·v < 2·Q1 − 3·IQR or 2·v > 2·Q3 + 3·IQR — so there is no
    quantizer anywhere in this operator, not even on the output. The
    boxplot's outlier count, bit-exact."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "f": batch["l_returnflag"].to_pandas(),
            "v": np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["f", "v"], as_index=False).sum(),
            preserve_index=False,
        )

    jc = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["f", "v"], as_index=False)["n"].sum()
        .sort_values(["f", "v"])
    )
    rows = []
    for f, g in jc.groupby("f"):
        cnt = g["n"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)

        def el(r):
            return int(v[np.searchsorted(cum, r)])

        q1 = el(-(-n // 4))
        q3 = el(-(-(3 * n) // 4))
        iqr = q3 - q1
        lo_out = int(cnt[2 * v < 2 * q1 - 3 * iqr].sum())
        hi_out = int(cnt[2 * v > 2 * q3 + 3 * iqr].sum())
        rows.append((f, n, q1, q3, iqr, lo_out, hi_out))
    return pd.DataFrame(
        rows,
        columns=["l_returnflag", "n", "q1", "q3", "iqr", "low_outliers",
                 "high_outliers"],
    ).sort_values("l_returnflag").reset_index(drop=True)


Q_TUKEY_FENCES_SQL = """
WITH c AS (SELECT l_returnflag AS f,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
t AS (SELECT f, CAST(SUM(n) AS BIGINT) AS nn FROM c GROUP BY f),
r AS (SELECT c.f, c.v, c.n, t.nn,
             CAST(SUM(c.n) OVER (PARTITION BY c.f ORDER BY c.v)
                  AS BIGINT) AS cum
      FROM c JOIN t USING (f)),
q AS (SELECT f, nn,
             MIN(CASE WHEN cum >= (nn + 3) // 4 THEN v END) AS q1,
             MIN(CASE WHEN cum >= (3 * nn + 3) // 4 THEN v END) AS q3
      FROM r GROUP BY f, nn),
k AS (SELECT q.f, q.nn, q.q1, q.q3, q.q3 - q.q1 AS iqr,
             CAST(COALESCE(SUM(c.n) FILTER (
               2 * c.v < 2 * q.q1 - 3 * (q.q3 - q.q1)), 0) AS BIGINT)
               AS low_outliers,
             CAST(COALESCE(SUM(c.n) FILTER (
               2 * c.v > 2 * q.q3 + 3 * (q.q3 - q.q1)), 0) AS BIGINT)
               AS high_outliers
      FROM q JOIN c USING (f)
      GROUP BY q.f, q.nn, q.q1, q.q3)
SELECT f AS l_returnflag, nn AS n, q1, q3, iqr, low_outliers,
       high_outliers
FROM k ORDER BY f
"""


def d_distinctive_tokens(sf_dir: str):
    """The three most DISTINCTIVE tokens per source by lift —
    (count_in_source/source_total) / (count_in_corpus/corpus_total),
    min corpus count 5 — the 'what makes this slice different' summary
    that raw top-k (d_top_tokens_by_source) can't give because common
    words dominate it. Lifts are identical doubles from exact integer
    ratios; ranking breaks ties on token text; one vocabulary-sized
    exchange."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "tok": ex.to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "tok"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    corpus = g.groupby("tok")["n"].sum()
    n_c = int(corpus.sum())
    totals = g.groupby("source")["n"].sum()
    g = g[g["tok"].map(corpus) >= 5]
    lift = (g["n"].to_numpy(np.float64)
            / g["source"].map(totals).to_numpy(np.float64)) \
        / (g["tok"].map(corpus).to_numpy(np.float64) / np.float64(n_c))
    g = g.assign(lift=_q6(lift))
    rows = []
    for src, gg in g.groupby("source"):
        top = gg.sort_values(["lift", "tok"],
                             ascending=[False, True]).head(3)
        for rk, (_, r) in enumerate(top.iterrows(), start=1):
            rows.append((src, rk, r["tok"], int(r["n"]),
                         float(r["lift"])))
    return pd.DataFrame(
        rows, columns=["source", "rank", "tok", "n_in_source", "lift"])


D_DISTINCTIVE_TOKENS_SQL = """
WITH u AS (SELECT source,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY source, tok),
ct AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS nc FROM c GROUP BY tok),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_c FROM c),
st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns FROM c
       GROUP BY source),
lf AS (SELECT c.source, c.tok, c.n,
              floor((CAST(c.n AS DOUBLE) / CAST(st.ns AS DOUBLE))
                    / (CAST(ct.nc AS DOUBLE) / CAST(tot.n_c AS DOUBLE))
                    * 1000000 + 0.5005) / 1000000 AS lift
       FROM c JOIN ct USING (tok) JOIN st USING (source) CROSS JOIN tot
       WHERE ct.nc >= 5),
r AS (SELECT source, tok, n, lift,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY lift DESC, tok) AS rk
      FROM lf)
SELECT source, CAST(rk AS BIGINT) AS rank, tok, n AS n_in_source, lift
FROM r WHERE rk <= 3 ORDER BY source, rank
"""


def t_ess(sf_dir: str):
    """Autocorrelation-adjusted effective sample size of the hourly
    event-count series: ESS = n / (1 + 2·Σρ_k), summing lags 1…20 and
    truncating at the first non-positive autocorrelation (Geyer's
    initial-positive rule) — the honest n for any mean-of-the-series
    confidence claim. Every ρ_k is the exact integer ratio from the
    Ljung-Box n²-scaling identity, quantized once; the truncation
    decision therefore lands identically in both engines; ESS is one
    final quantized division."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    S = int(y.sum())
    P0 = int((y.astype(object) * y.astype(object)).sum())
    c0 = n * n * P0 - n * S * S
    rsum_micro = 0
    k_used = 0
    for k in range(1, 21):
        a, b = y[:-k], y[k:]
        Pk = int((a.astype(object) * b.astype(object)).sum())
        ck = n * n * Pk - n * S * (int(a.sum()) + int(b.sum())) \
            + (n - k) * S * S
        r_micro = int(np.floor(np.float64(ck) / np.float64(c0) * 1e6
                               + 0.5005))
        if r_micro <= 0:
            break
        rsum_micro += r_micro
        k_used = k
    ess = _q6(np.float64(n)
              / (1.0 + 2.0 * (np.float64(rsum_micro) / 1e6)))
    return pd.DataFrame({
        "n_hours": [n], "k_used": [k_used],
        "rho_sum": [rsum_micro / 1e6], "ess": [float(ess)],
    })


T_ESS_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
y AS (SELECT grid.h, COALESCE(c.n, 0) AS n FROM grid LEFT JOIN c USING (h)),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
               CAST(SUM(n) AS HUGEINT) AS s,
               CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS p0
        FROM y),
lags AS (SELECT unnest(generate_series(1, 20)) AS k),
pk AS (SELECT lags.k,
              CAST(SUM(CAST(a.n AS HUGEINT) * bb.n) AS HUGEINT) AS p,
              CAST(SUM(a.n) AS HUGEINT) AS sh,
              CAST(SUM(bb.n) AS HUGEINT) AS st
       FROM lags JOIN y a ON TRUE JOIN y bb ON bb.h = a.h + lags.k
       GROUP BY lags.k),
r AS (SELECT pk.k,
             CAST(floor(CAST(tot.nn * tot.nn * pk.p
                             - tot.nn * tot.s * (pk.sh + pk.st)
                             + (tot.nn - pk.k) * tot.s * tot.s AS DOUBLE)
                        / CAST(tot.nn * tot.nn * tot.p0
                               - tot.nn * tot.s * tot.s AS DOUBLE)
                        * 1000000 + 0.5005) AS BIGINT) AS r_micro
      FROM pk CROSS JOIN tot),
cut AS (SELECT COALESCE(MIN(k) - 1, 20) AS k_used
        FROM r WHERE r_micro <= 0),
agg AS (SELECT CAST(COALESCE(SUM(r.r_micro), 0) AS BIGINT) AS rsum
        FROM r CROSS JOIN cut WHERE r.k <= cut.k_used)
SELECT CAST(tot.nn AS BIGINT) AS n_hours,
       CAST(cut.k_used AS BIGINT) AS k_used,
       agg.rsum / 1000000.0 AS rho_sum,
       floor(CAST(tot.nn AS DOUBLE)
             / (1.0 + 2.0 * (CAST(agg.rsum AS DOUBLE) / 1000000))
             * 1000000 + 0.5005) / 1000000 AS ess
FROM tot CROSS JOIN cut CROSS JOIN agg
"""


def d_good_turing(sf_dir: str):
    """Good–Turing unseen-mass estimate per source: the probability
    the NEXT token is a never-seen type ≈ n₁/N (singleton fraction),
    with vocabulary, singleton and doubleton counts — the sample-
    coverage number that says whether a source's vocabulary is
    anywhere near exhausted. All counts are exact integers from one
    vocabulary-sized exchange; the two output rates quantize once
    each."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "tok": ex.to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "tok"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for src, gg in g.groupby("source"):
        cnt = gg["n"].to_numpy(np.int64)
        N = int(cnt.sum())
        V = len(cnt)
        n1 = int((cnt == 1).sum())
        n2 = int((cnt == 2).sum())
        rows.append((src, N, V, n1, n2,
                     float(_q6(np.float64(n1) / np.float64(N))),
                     float(_q6(1.0 - np.float64(n1) / np.float64(N)))))
    return pd.DataFrame(
        rows,
        columns=["source", "n_tokens", "vocab", "singletons",
                 "doubletons", "p_unseen", "coverage"],
    ).sort_values("source").reset_index(drop=True)


D_GOOD_TURING_SQL = """
WITH u AS (SELECT source,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY source, tok),
s AS (SELECT source,
             CAST(SUM(n) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(COUNT(*) FILTER (n = 1) AS BIGINT) AS singletons,
             CAST(COUNT(*) FILTER (n = 2) AS BIGINT) AS doubletons
      FROM c GROUP BY source)
SELECT source, n_tokens, vocab, singletons, doubletons,
       floor(CAST(singletons AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS p_unseen,
       floor((1.0 - CAST(singletons AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS coverage
FROM s ORDER BY source
"""


def t_circular_mean(sf_dir: str):
    """Circular mean activity hour per event type, with the resultant
    length R — the statistic that knows 23:00 and 01:00 average to
    midnight, not noon. Reuses t_spectral's shared 24-entry
    micro-quantized trig table so the Σcos/Σsin folds are exact
    integer sums over (type, hour) cells; the mean hour comes from one
    atan2 of identical doubles (mapped to [0, 24)) and R from one
    sqrt, each quantized once."""
    from ray.data.aggregate import Sum

    k = np.arange(24, dtype=np.float64)
    cos_m = np.floor(np.cos(2.0 * np.pi * k / 24.0) * 1e6 + 0.5005) \
        .astype(np.int64)
    sin_m = np.floor(np.sin(2.0 * np.pi * k / 24.0) * 1e6 + 0.5005) \
        .astype(np.int64)

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "hr": ((us // 3_600_000_000) % 24).astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["event_type", "hr"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "hr"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, gg in g.groupby("event_type"):
        hr = gg["hr"].to_numpy(np.int64)
        n = gg["n"].to_numpy(np.int64)
        N = int(n.sum())
        cf = int((n * cos_m[hr]).sum())
        sf = int((n * sin_m[hr]).sum())
        a = np.float64(cf) / 1e6
        b = np.float64(sf) / 1e6
        ang = np.arctan2(b, a)
        mean_hr = (ang / (2.0 * np.pi) * 24.0) % 24.0
        R = np.sqrt(a * a + b * b) / np.float64(N)
        rows.append((et, N, float(_q6(mean_hr)), float(_q6(R))))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "mean_hour", "resultant_r"]
    ).sort_values("event_type").reset_index(drop=True)


T_CIRCULAR_MEAN_SQL = """
WITH trig AS (SELECT k,
                CAST(floor(cos(2 * pi() * k / 24.0) * 1000000 + 0.5005)
                     AS BIGINT) AS cm,
                CAST(floor(sin(2 * pi() * k / 24.0) * 1000000 + 0.5005)
                     AS BIGINT) AS sm
              FROM (SELECT unnest(generate_series(0, 23)) AS k)),
c AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
f AS (SELECT c.event_type,
             CAST(SUM(c.n) AS BIGINT) AS nn,
             CAST(SUM(c.n * trig.cm) AS BIGINT) AS cf,
             CAST(SUM(c.n * trig.sm) AS BIGINT) AS sf
      FROM c JOIN trig ON trig.k = c.hr
      GROUP BY c.event_type),
e AS (SELECT event_type, nn,
             CAST(cf AS DOUBLE) / 1000000 AS a,
             CAST(sf AS DOUBLE) / 1000000 AS b
      FROM f)
SELECT event_type, nn AS n,
       floor(((atan2(b, a) / (2 * pi()) * 24.0) % 24.0 + 24.0) % 24.0
             * 1000000 + 0.5005) / 1000000 AS mean_hour,
       floor(sqrt(a * a + b * b) / CAST(nn AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS resultant_r
FROM e ORDER BY event_type
"""


def q_mahalanobis(sf_dir: str):
    """Bivariate Mahalanobis outlier census over (quantity, price
    cents): the 2×2 covariance comes from exact integer moments, every
    row's d² evaluates from token-identical doubles against the shared
    quantized-inverse-free closed form (d² = (a·dx² − 2b·dx·dy +
    c·dy²)·n·(n−1)/det with a,b,c,det all rationals of exact sums),
    and the census counts rows beyond the 3σ ellipse (d² > 9) — the
    multivariate outlier check a per-column z-score can't do (it
    misses the cheap-but-huge order). Two passes: one moment exchange,
    one counting scan with the moments broadcast as plain closure
    floats."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def moments(batch: pa.Table) -> pa.Table:
        x = batch["l_quantity"].to_numpy().astype(np.int64)
        y = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)]),
            "sx": pa.array([int(x.sum())]),
            "sy": pa.array([int(y.sum())]),
            "sxx": pa.array([int((x * x).sum())]),
            "syy": pa.array([int((y.astype(object)
                                  * y.astype(object)).sum())]),
            "sxy": pa.array([int((x * y).sum())]),
        })

    m = ds.map_batches(moments, batch_format="pyarrow") \
        .sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    n = int(m["sum(n)"])
    sx, sy = int(m["sum(sx)"]), int(m["sum(sy)"])
    sxx, syy, sxy = int(m["sum(sxx)"]), int(m["sum(syy)"]), \
        int(m["sum(sxy)"])
    nf = np.float64(n)
    mx, my = np.float64(sx) / nf, np.float64(sy) / nf
    # sample covariance entries (ddof=1), identical doubles both sides
    a = (np.float64(sxx) - np.float64(sx) * np.float64(sx) / nf) \
        / (nf - 1.0)
    c = (np.float64(syy) - np.float64(sy) * np.float64(sy) / nf) \
        / (nf - 1.0)
    b = (np.float64(sxy) - np.float64(sx) * np.float64(sy) / nf) \
        / (nf - 1.0)
    det = a * c - b * b

    def census(batch: pa.Table) -> pa.Table:
        x = batch["l_quantity"].to_numpy().astype(np.float64)
        y = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
        dx, dy = x - mx, y - my
        d2 = (c * dx * dx - 2.0 * b * dx * dy + a * dy * dy) / det
        return pa.table({"out": pa.array([int((d2 > 9.0).sum())]),
                         "tot": pa.array([len(x)])})

    s = ds.map_batches(census, batch_format="pyarrow").sum(["out", "tot"])
    return pd.DataFrame({
        "n": [int(s["sum(tot)"])],
        "n_outliers": [int(s["sum(out)"])],
        "mean_qty": [float(_q6(mx))],
        "mean_price_cents": [float(_q6(my))],
        "corr": [float(_q6(b / np.sqrt(a * c)))],
    })


Q_MAHALANOBIS_SQL = """
WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
           FROM lineitem),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM v),
e AS (SELECT n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
             (CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS a,
             (CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cc,
             (CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS b
      FROM m),
k AS (SELECT e.n, e.mx, e.my, e.a, e.cc, e.b,
             e.a * e.cc - e.b * e.b AS det
      FROM e),
cnt AS (SELECT CAST(COUNT(*) FILTER (
          (k.cc * (CAST(v.x AS DOUBLE) - k.mx)
                 * (CAST(v.x AS DOUBLE) - k.mx)
           - 2.0 * k.b * (CAST(v.x AS DOUBLE) - k.mx)
                   * (CAST(v.y AS DOUBLE) - k.my)
           + k.a * (CAST(v.y AS DOUBLE) - k.my)
                   * (CAST(v.y AS DOUBLE) - k.my)) / k.det > 9.0)
          AS BIGINT) AS n_out
        FROM v CROSS JOIN k)
SELECT k.n, cnt.n_out AS n_outliers,
       floor(k.mx * 1000000 + 0.5005) / 1000000 AS mean_qty,
       floor(k.my * 1000000 + 0.5005) / 1000000 AS mean_price_cents,
       floor(k.b / sqrt(k.a * k.cc) * 1000000 + 0.5005) / 1000000
         AS corr
FROM k CROSS JOIN cnt
"""


def q_partial_corr(sf_dir: str):
    """Partial correlation of quantity and price CONTROLLING for
    discount: r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) — the
    'is this relationship real or is a third column driving both'
    check. All three pairwise correlations derive from one exact
    9-moment exchange, quantize once each, and the partial recomputes
    from the QUANTIZED trio so cross-engine agreement is structural."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice", "l_discount"])

    def moments(batch: pa.Table) -> pa.Table:
        x = batch["l_quantity"].to_numpy().astype(np.int64)
        y = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        z = np.floor(batch["l_discount"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        yo = y.astype(object)
        return pa.table({
            "n": pa.array([len(x)]),
            "sx": pa.array([int(x.sum())]),
            "sy": pa.array([int(y.sum())]),
            "sz": pa.array([int(z.sum())]),
            "sxx": pa.array([int((x * x).sum())]),
            "syy": pa.array([int((yo * yo).sum())]),
            "szz": pa.array([int((z * z).sum())]),
            "sxy": pa.array([int((x * y).sum())]),
            "sxz": pa.array([int((x * z).sum())]),
            "syz": pa.array([int((yo * z.astype(object)).sum())]),
        })

    cols = ["n", "sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz",
            "syz"]
    m = ds.map_batches(moments, batch_format="pyarrow").sum(cols)
    v = {c: int(m[f"sum({c})"]) for c in cols}
    n = np.float64(v["n"])

    def corr(sa, sb, sab, saa, sbb):
        num = n * np.float64(v[sab]) \
            - np.float64(v[sa]) * np.float64(v[sb])
        da = n * np.float64(v[saa]) \
            - np.float64(v[sa]) * np.float64(v[sa])
        db = n * np.float64(v[sbb]) \
            - np.float64(v[sb]) * np.float64(v[sb])
        return float(_q6(num / np.sqrt(da * db)))

    r_xy = corr("sx", "sy", "sxy", "sxx", "syy")
    r_xz = corr("sx", "sz", "sxz", "sxx", "szz")
    r_yz = corr("sy", "sz", "syz", "syy", "szz")
    part = float(_q6((r_xy - r_xz * r_yz)
                     / np.sqrt((1.0 - r_xz * r_xz)
                               * (1.0 - r_yz * r_yz))))
    return pd.DataFrame({
        "n": [v["n"]], "r_xy": [r_xy], "r_xz": [r_xz], "r_yz": [r_yz],
        "partial_r": [part],
    })


Q_PARTIAL_CORR_SQL = """
WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS z
           FROM lineitem),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(z) AS HUGEINT) AS sz,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz,
             CAST(SUM(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz
      FROM v),
r AS (SELECT n,
  floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        * 1000000 + 0.5005) / 1000000 AS r_xy,
  floor((CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                  - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
        * 1000000 + 0.5005) / 1000000 AS r_xz,
  floor((CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
         - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
        / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                  - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
        * 1000000 + 0.5005) / 1000000 AS r_yz
  FROM m)
SELECT n, r_xy, r_xz, r_yz,
       floor((r_xy - r_xz * r_yz)
             / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz))
             * 1000000 + 0.5005) / 1000000 AS partial_r
FROM r
"""


def t_pinball(sf_dir: str):
    """Pinball (quantile) loss of the 24h seasonal-naive forecast at
    q = 0.9 per event type — the metric that scores a forecast used
    for CAPACITY (under-predicting costs 9× more than over). With
    integer count errors the ×10-scaled loss 9·max(e,0) + 1·max(−e,0)
    folds as an EXACT integer over the dense hourly grid; the mean
    loss is one quantized division. Complements t_forecast_error's
    MASE, which treats both error signs alike."""
    from ray.data.aggregate import Max, Min, Sum

    ts = _read(sf_dir, "events", columns=["ts"])
    mm = ts.aggregate(Min("ts"), Max("ts"))
    lo = int(np.datetime64(mm["min(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    hi = int(np.datetime64(mm["max(ts)"], "us").astype(np.int64)) \
        // 3_600_000_000
    H = hi - lo + 1

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "h": (us // 3_600_000_000).astype(np.int64), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["event_type", "h"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "h"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, grp in g.groupby("event_type"):
        y = np.zeros(H, np.int64)
        y[grp["h"].to_numpy(np.int64) - lo] = grp["n"].to_numpy(np.int64)
        e = y[24:] - y[:-24]            # actual − forecast, exact ints
        loss10 = int((9 * np.maximum(e, 0) - np.minimum(e, 0)).sum())
        m = H - 24
        rows.append((et, m, loss10,
                     float(_q6(np.float64(loss10)
                               / (10.0 * np.float64(m))))))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_forecasts", "loss_x10",
                 "mean_pinball"],
    ).sort_values("event_type").reset_index(drop=True)


T_PINBALL_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT t.event_type, g.h
         FROM (SELECT DISTINCT event_type FROM events) t
         CROSS JOIN (SELECT unnest(generate_series(b.lo, b.hi)) AS h
                     FROM b) g),
c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
y AS (SELECT grid.event_type, grid.h, COALESCE(c.n, 0) AS n
      FROM grid LEFT JOIN c USING (event_type, h)),
l AS (SELECT event_type, n,
             LAG(n, 24) OVER (PARTITION BY event_type ORDER BY h) AS n24
      FROM y),
s AS (SELECT event_type,
             CAST(COUNT(*) FILTER (n24 IS NOT NULL) AS BIGINT) AS m,
             CAST(SUM(9 * greatest(n - n24, 0)
                      - least(n - n24, 0)) FILTER (n24 IS NOT NULL)
                  AS BIGINT) AS loss10
      FROM l GROUP BY event_type)
SELECT event_type, m AS n_forecasts, loss10 AS loss_x10,
       floor(CAST(loss10 AS DOUBLE) / (10.0 * CAST(m AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS mean_pinball
FROM s ORDER BY event_type
"""


def q_odds_ratio(sf_dir: str):
    """Odds ratio of ever-purchasing between odd- and even-user arms,
    with the Woolf log-interval: the 2×2 table is pure integer counts
    from one per-user reduction, OR = (a·d)/(b·c) is a ratio of exact
    integer products, and the 95% CI exponentiates ln(OR) ±
    1.96·√(1/a+1/b+1/c+1/d) from token-identical doubles — the
    epidemiologist's effect size for binary outcomes."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"],
               split=True)

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64),
            "p": (g["event_type"].to_numpy(object) == "purchase")
            .astype(np.int64),
        })
        r = df.groupby("u", as_index=False)["p"].max()
        return r

    u = grouped_map(ds, "user_id", flags).to_pandas()
    treat = u["u"].to_numpy(np.int64) % 2 == 1
    buy = u["p"].to_numpy(np.int64) == 1
    a = int((treat & buy).sum())        # treated purchasers
    b = int((treat & ~buy).sum())
    c = int((~treat & buy).sum())
    d = int((~treat & ~buy).sum())
    if min(a, b, c, d) == 0:
        orr, lo, hi = 0.0, 0.0, 0.0
    else:
        orr_raw = np.float64(a * d) / np.float64(b * c)
        se = np.sqrt(1.0 / np.float64(a) + 1.0 / np.float64(b)
                     + 1.0 / np.float64(c) + 1.0 / np.float64(d))
        orr = float(_q6(orr_raw))
        lo = float(_q6(np.exp(np.log(orr_raw) - 1.96 * se)))
        hi = float(_q6(np.exp(np.log(orr_raw) + 1.96 * se)))
    return pd.DataFrame({
        "a": [a], "b": [b], "c": [c], "d": [d],
        "odds_ratio": [orr], "ci_lo": [lo], "ci_hi": [hi],
    })


Q_ODDS_RATIO_SQL = """
WITH u AS (SELECT user_id, user_id % 2 = 1 AS treat,
                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS p
           FROM events GROUP BY user_id),
t AS (SELECT CAST(COUNT(*) FILTER (treat AND p = 1) AS BIGINT) AS a,
             CAST(COUNT(*) FILTER (treat AND p = 0) AS BIGINT) AS b,
             CAST(COUNT(*) FILTER (NOT treat AND p = 1) AS BIGINT) AS c,
             CAST(COUNT(*) FILTER (NOT treat AND p = 0) AS BIGINT) AS d
      FROM u)
SELECT a, b, c, d,
  CASE WHEN least(a, b, c, d) = 0 THEN 0.0
       ELSE floor(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE)
                  * 1000000 + 0.5005) / 1000000 END AS odds_ratio,
  CASE WHEN least(a, b, c, d) = 0 THEN 0.0
       ELSE floor(exp(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
                      - 1.96 * sqrt(1.0 / CAST(a AS DOUBLE)
                                    + 1.0 / CAST(b AS DOUBLE)
                                    + 1.0 / CAST(c AS DOUBLE)
                                    + 1.0 / CAST(d AS DOUBLE)))
                  * 1000000 + 0.5005) / 1000000 END AS ci_lo,
  CASE WHEN least(a, b, c, d) = 0 THEN 0.0
       ELSE floor(exp(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
                      + 1.96 * sqrt(1.0 / CAST(a AS DOUBLE)
                                    + 1.0 / CAST(b AS DOUBLE)
                                    + 1.0 / CAST(c AS DOUBLE)
                                    + 1.0 / CAST(d AS DOUBLE)))
                  * 1000000 + 0.5005) / 1000000 END AS ci_hi
FROM t
"""


def t_perm_entropy(sf_dir: str):
    """Order-3 permutation entropy of the hourly event-count series —
    the model-free complexity score (low = predictable motif
    structure, ln 6 ≈ 1.79 = white noise). Every consecutive triple
    maps to a pattern id from three STRICT integer comparisons
    ((y₁<y₂)·4 + (y₂<y₃)·2 + (y₁<y₃) — ties form their own
    deterministic classes instead of being broken arbitrarily), the
    pattern histogram is exact integer counts, and the entropy is the
    d_mix_entropy micro-fold with one quantized division."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    y1, y2, y3 = y[:-2], y[1:-1], y[2:]
    pid = ((y1 < y2).astype(np.int64) * 4
           + (y2 < y3).astype(np.int64) * 2
           + (y1 < y3).astype(np.int64))
    cnt = np.bincount(pid, minlength=8)
    m = int(cnt.sum())
    p = cnt[cnt > 0].astype(np.float64) / np.float64(m)
    fold = int(np.floor(-p * np.log(p) * 1e6 + 0.5005)
               .astype(np.int64).sum())
    h = _q6(np.float64(fold) / 1e6)
    return pd.DataFrame({
        "n_triples": [m], "n_patterns": [int((cnt > 0).sum())],
        "entropy": [float(h)],
        "normalized": [float(_q6(h / np.log(np.float64(6.0))))],
    })


T_PERM_ENTROPY_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi
           FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
y AS (SELECT grid.h, COALESCE(c.n, 0) AS n FROM grid LEFT JOIN c USING (h)),
w AS (SELECT n AS y1,
             LEAD(n, 1) OVER (ORDER BY h) AS y2,
             LEAD(n, 2) OVER (ORDER BY h) AS y3
      FROM y),
pid AS (SELECT CAST(CASE WHEN y1 < y2 THEN 4 ELSE 0 END
                    + CASE WHEN y2 < y3 THEN 2 ELSE 0 END
                    + CASE WHEN y1 < y3 THEN 1 ELSE 0 END AS BIGINT)
          AS pid
        FROM w WHERE y3 IS NOT NULL),
cnt AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS n FROM pid GROUP BY pid),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM cnt),
f AS (SELECT CAST(SUM(CAST(floor(-(cnt.n / CAST(t.m AS DOUBLE))
                                 * ln(cnt.n / CAST(t.m AS DOUBLE))
                                 * 1000000 + 0.5005) AS BIGINT))
                  AS BIGINT) AS fold
      FROM cnt CROSS JOIN t),
e AS (SELECT t.m, t.k,
             floor(CAST(f.fold AS DOUBLE) / 1000000
                   * 1000000 + 0.5005) / 1000000 AS entropy
      FROM f CROSS JOIN t)
SELECT m AS n_triples, k AS n_patterns, entropy,
       floor(entropy / ln(6.0) * 1000000 + 0.5005) / 1000000
         AS normalized
FROM e
"""


def q_iqv(sf_dir: str):
    """Index of qualitative variation of the event-type mix:
    IQV = (k/(k−1))·(1 − Σp²) — the categorical 'variance' that is 0
    when one type dominates and 1 when all k types are equally common.
    Σp² is ONE exact integer ratio Σn²/N² (no per-type share float
    ever exists), so the whole operator is two exact integers and one
    quantized expression."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type"])

    def cells(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "n": g["count_all"]})

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("event_type").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = [int(x) for x in g["n"]]
    N = sum(n)
    sq = sum(x * x for x in n)
    k = len(n)
    iqv = _q6((np.float64(k) / np.float64(k - 1))
              * (1.0 - np.float64(sq)
                 / (np.float64(N) * np.float64(N))))
    return pd.DataFrame({
        "k": [k], "n": [N], "sum_sq": [sq], "iqv": [float(iqv)],
    })


Q_IQV_SQL = """
WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY event_type),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sq
      FROM c)
SELECT k, nn AS n, CAST(sq AS BIGINT) AS sum_sq,
       floor((CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
             * (1.0 - CAST(sq AS DOUBLE)
                      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
             * 1000000 + 0.5005) / 1000000 AS iqv
FROM t
"""


def d_token_dispersion(sf_dir: str):
    """Church–Gale burstiness of the top-10 corpus tokens: the
    variance-to-mean ratio of PER-DOCUMENT counts (zero-docs included)
    — a function word sits near 1 (Poisson), a topical word far above
    (it clumps). Two passes: exact global top-10 selection
    (count, token tie-break), then per-(token, doc) count cells
    restricted to those ten; Σc and Σc² fold exactly with the zero
    documents entering only through the total doc count, VMR is one
    quantized expression."""
    from ray.data.aggregate import Sum

    n_docs = _table_nrows(sf_dir, "documents")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tok_cells(batch: pa.Table) -> pa.Table:
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({"tok": ex.to_numpy(), "n": 1})
        return pa.Table.from_pandas(
            df.groupby("tok", as_index=False).sum(), preserve_index=False)

    top = (
        ds.map_batches(tok_cells, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values(["n", "tok"], ascending=[False, True])
        .head(10)
    )
    keep = set(top["tok"])

    def doc_cells(batch: pa.Table) -> pa.Table:
        ids = pd.Series(batch["doc_id"].to_numpy())
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "doc": ids.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "tok": ex.to_numpy(), "n": 1,
        })
        df = df[df["tok"].isin(keep)]
        g = df.groupby(["tok", "doc"], as_index=False).sum()
        g["c2"] = g["n"] * g["n"]
        return pa.Table.from_pandas(
            g.groupby("tok", as_index=False)[["n", "c2"]].sum()
            .assign(docs=g.groupby("tok").size().to_numpy(np.int64)),
            preserve_index=False)

    agg = (
        ds.map_batches(doc_cells, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"), Sum("c2", alias_name="c2"),
                   Sum("docs", alias_name="docs"))
        .to_pandas()
    )
    rows = []
    for _, r in agg.iterrows():
        S, Q = int(r["n"]), int(r["c2"])
        D = np.float64(n_docs)
        mean = np.float64(S) / D
        var = (np.float64(Q) - np.float64(S) * np.float64(S) / D) \
            / (D - 1.0)
        rows.append((r["tok"], S, int(r["docs"]),
                     float(_q6(mean)), float(_q6(var / mean))))
    return pd.DataFrame(
        rows, columns=["tok", "count", "doc_freq", "mean_per_doc", "vmr"]
    ).sort_values("tok").reset_index(drop=True)


D_TOKEN_DISPERSION_SQL = """
WITH u AS (SELECT doc_id,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
top AS (SELECT tok FROM (SELECT tok, COUNT(*) AS n FROM u GROUP BY tok)
        ORDER BY n DESC, tok LIMIT 10),
c AS (SELECT u.tok, u.doc_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM u JOIN top USING (tok) GROUP BY u.tok, u.doc_id),
d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
s AS (SELECT tok,
             CAST(SUM(n) AS BIGINT) AS cnt,
             CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS c2,
             CAST(COUNT(*) AS BIGINT) AS docs
      FROM c GROUP BY tok),
e AS (SELECT s.tok, s.cnt, s.docs,
             CAST(s.cnt AS DOUBLE) / CAST(d.n_docs AS DOUBLE) AS mean,
             (CAST(s.c2 AS DOUBLE)
              - CAST(s.cnt AS DOUBLE) * CAST(s.cnt AS DOUBLE)
                / CAST(d.n_docs AS DOUBLE))
               / (CAST(d.n_docs AS DOUBLE) - 1.0) AS var
      FROM s CROSS JOIN d)
SELECT tok, cnt AS count, docs AS doc_freq,
       floor(mean * 1000000 + 0.5005) / 1000000 AS mean_per_doc,
       floor(var / mean * 1000000 + 0.5005) / 1000000 AS vmr
FROM e ORDER BY tok
"""


def q_assortativity(sf_dir: str):
    """Degree assortativity of the supplier–part bipartite graph: the
    Pearson correlation between the two endpoint degrees across the
    DISTINCT edge set — positive means hub suppliers stock hub parts
    (skew compounds in joins), negative means hubs pair with leaves.
    Per-batch edge-dedup partials feed a driver distinct fold (the
    generic two-key Ray groupby measured 9s where this takes ~2; at
    100 TB the global distinct would go back through a keyed
    exchange); degrees and the five exact integer moments then run in
    one vectorized pass and r quantizes once."""
    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def dedup_part(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_suppkey", "l_partkey"]).aggregate([])

    edges = (
        ds.map_batches(dedup_part, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    s = edges["l_suppkey"].to_numpy(np.int64)
    p = edges["l_partkey"].to_numpy(np.int64)
    _, sinv = np.unique(s, return_inverse=True)
    _, pinv = np.unique(p, return_inverse=True)
    x = np.bincount(sinv)[sinv]          # supplier degree per edge
    y = np.bincount(pinv)[pinv]          # part degree per edge
    n = len(edges)
    sx, sy = _exact_sum(x), _exact_sum(y)
    sxx, syy = _exact_dot(x, x), _exact_dot(y, y)
    sxy = _exact_dot(x, y)
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    nf = np.float64(n)
    return pd.DataFrame({
        "n_edges": [n],
        "mean_sdeg": [float(_q6(np.float64(sx) / nf))],
        "mean_pdeg": [float(_q6(np.float64(sy) / nf))],
        "assortativity": [0.0 if dx == 0 or dy == 0 else float(
            _q6(np.float64(num)
                / np.sqrt(np.float64(dx) * np.float64(dy))))],
    })


Q_ASSORTATIVITY_SQL = """
WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
sd AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY s),
pdg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY p),
j AS (SELECT sd.d AS x, pdg.d AS y
      FROM e JOIN sd USING (s) JOIN pdg USING (p)),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM j)
SELECT CAST(n AS BIGINT) AS n_edges,
       floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_sdeg,
       floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_pdeg,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN 0.0
            ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE))
                       * 1000000 + 0.5005) / 1000000 END
         AS assortativity
FROM m
"""


def d_js_matrix(sf_dir: str):
    """Pairwise Jensen–Shannon divergence matrix between all source
    unigram distributions — the distance matrix you cluster before
    deciding which corpora are interchangeable in a mix (d_js_divergence
    gives each source's drift from the corpus; this gives the full
    geometry). Same 1e-9 micro-fold discipline per (pair, token) term
    over the union support; one vocabulary-sized exchange feeds all
    O(sources²) pairs."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "tok": ex.to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "tok"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = g.pivot_table(index="tok", columns="source", values="n",
                        fill_value=0, aggfunc="sum").sort_index()
    srcs = sorted(piv.columns)
    counts = {s: piv[s].to_numpy(np.int64) for s in srcs}
    totals = {s: int(counts[s].sum()) for s in srcs}
    rows = []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            na, nb = counts[sa], counts[sb]
            sup = (na > 0) | (nb > 0)
            p = na[sup].astype(np.float64) / np.float64(totals[sa])
            q = nb[sup].astype(np.float64) / np.float64(totals[sb])
            m = 0.5 * (p + q)
            tp = np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0) / m),
                          0.0)
            tq = np.where(q > 0, q * np.log(np.where(q > 0, q, 1.0) / m),
                          0.0)
            fp = int(np.where(p > 0, np.floor(tp * 1e9 + 0.5005), 0)
                     .astype(np.int64).sum())
            fq = int(np.where(q > 0, np.floor(tq * 1e9 + 0.5005), 0)
                     .astype(np.int64).sum())
            jsd = _q6(0.5 * (np.float64(fp) / 1e9)
                      + 0.5 * (np.float64(fq) / 1e9))
            rows.append((sa, sb, float(jsd)))
    return pd.DataFrame(rows, columns=["src_a", "src_b", "jsd"])


D_JS_MATRIX_SQL = """
WITH u AS (SELECT source,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY source, tok),
st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns FROM c
       GROUP BY source),
pairs AS (SELECT a.source AS sa, b.source AS sb
          FROM st a JOIN st b ON a.source < b.source),
sup AS (SELECT p.sa, p.sb, t.tok,
               COALESCE(ca.n, 0) AS na, COALESCE(cb.n, 0) AS nb
        FROM pairs p
        CROSS JOIN (SELECT DISTINCT tok FROM c) t
        LEFT JOIN c ca ON ca.source = p.sa AND ca.tok = t.tok
        LEFT JOIN c cb ON cb.source = p.sb AND cb.tok = t.tok
        WHERE COALESCE(ca.n, 0) > 0 OR COALESCE(cb.n, 0) > 0),
term AS (SELECT s.sa, s.sb,
  CASE WHEN s.na > 0 THEN
    CAST(floor((CAST(s.na AS DOUBLE) / CAST(ta.ns AS DOUBLE))
      * ln((CAST(s.na AS DOUBLE) / CAST(ta.ns AS DOUBLE))
           / (0.5 * (CAST(s.na AS DOUBLE) / CAST(ta.ns AS DOUBLE)
                     + CAST(s.nb AS DOUBLE) / CAST(tb.ns AS DOUBLE))))
      * 1000000000 + 0.5005) AS BIGINT) ELSE 0 END AS fp,
  CASE WHEN s.nb > 0 THEN
    CAST(floor((CAST(s.nb AS DOUBLE) / CAST(tb.ns AS DOUBLE))
      * ln((CAST(s.nb AS DOUBLE) / CAST(tb.ns AS DOUBLE))
           / (0.5 * (CAST(s.na AS DOUBLE) / CAST(ta.ns AS DOUBLE)
                     + CAST(s.nb AS DOUBLE) / CAST(tb.ns AS DOUBLE))))
      * 1000000000 + 0.5005) AS BIGINT) ELSE 0 END AS fq
  FROM sup s
  JOIN st ta ON ta.source = s.sa
  JOIN st tb ON tb.source = s.sb)
SELECT sa AS src_a, sb AS src_b,
       floor((0.5 * (CAST(SUM(fp) AS DOUBLE) / 1000000000)
              + 0.5 * (CAST(SUM(fq) AS DOUBLE) / 1000000000))
             * 1000000 + 0.5005) / 1000000 AS jsd
FROM term GROUP BY sa, sb ORDER BY sa, sb
"""


def q_spearman_price(sf_dir: str):
    """Spearman rank correlation between quantity and extended price
    (cents) with average-rank ties, computed ENTIRELY on marginal and
    joint contingency cells — the O(n) global rank sort never happens.
    Doubled average ranks R2(v) = 2·cum_before + n_v + 1 keep tied
    half-ranks integral, so all five weighted moments fold as exact
    Python ints (HUGEINT twins on the SQL side) and ρ quantizes once.
    Per-batch (qty, cent) partials fold driver-side — the price-cent
    key is near-unique and the multi-column Ray groupby measured
    8–22 s on sibling ops for a sort-shuffle that compresses nothing;
    at 100 TB the fold goes back through a keyed cell exchange."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "x": np.floor(batch["l_quantity"].to_numpy() + 0.5)
                .astype(np.int64),
            "y": np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["x", "y"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["x", "y"], as_index=False)["n"].sum()
    )

    def dranks(col: str) -> pd.Series:
        m = g.groupby(col)["n"].sum().sort_index()
        nv = m.to_numpy(np.int64)
        cum = np.concatenate(([np.int64(0)], np.cumsum(nv)[:-1]))
        return pd.Series(2 * cum + nv + 1, index=m.index)

    rx, ry = dranks("x"), dranks("y")
    w = g["n"].to_numpy(np.int64)
    ax = rx.loc[g["x"]].to_numpy(np.int64)
    ay = ry.loc[g["y"]].to_numpy(np.int64)
    n = int(w.sum())
    if (2 * n + 1) ** 2 >= (1 << 62):  # doubled-rank square would wrap
        ax, ay = ax.astype(object), ay.astype(object)
    swx, swy = _exact_dot(w, ax), _exact_dot(w, ay)
    swxx, swyy = _exact_dot(w, ax * ax), _exact_dot(w, ay * ay)
    swxy = _exact_dot(w, ax * ay)
    num = n * swxy - swx * swy
    dx = n * swxx - swx * swx
    dy = n * swyy - swy * swy
    rho = 0.0 if dx == 0 or dy == 0 else float(_q6(
        np.float64(float(num))
        / np.sqrt(np.float64(float(dx)) * np.float64(float(dy)))))
    return pd.DataFrame({"n": [n], "spearman_rho": [rho]})


Q_SPEARMAN_PRICE_SQL = """
WITH v AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
           FROM lineitem),
cell AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY x, y),
xm AS (SELECT x, CAST(SUM(n) AS BIGINT) AS nv FROM cell GROUP BY x),
xr AS (SELECT x, 2 * (SUM(nv) OVER (ORDER BY x) - nv) + nv + 1 AS rx
       FROM xm),
ym AS (SELECT y, CAST(SUM(n) AS BIGINT) AS nv FROM cell GROUP BY y),
yr AS (SELECT y, 2 * (SUM(nv) OVER (ORDER BY y) - nv) + nv + 1 AS ry
       FROM ym),
m AS (SELECT CAST(SUM(c.n) AS HUGEINT) AS n,
             CAST(SUM(CAST(c.n AS HUGEINT) * xr.rx) AS HUGEINT) AS swx,
             CAST(SUM(CAST(c.n AS HUGEINT) * yr.ry) AS HUGEINT) AS swy,
             CAST(SUM(CAST(c.n AS HUGEINT) * xr.rx * xr.rx) AS HUGEINT)
               AS swxx,
             CAST(SUM(CAST(c.n AS HUGEINT) * yr.ry * yr.ry) AS HUGEINT)
               AS swyy,
             CAST(SUM(CAST(c.n AS HUGEINT) * xr.rx * yr.ry) AS HUGEINT)
               AS swxy
      FROM cell c JOIN xr USING (x) JOIN yr USING (y))
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN n * swxx - swx * swx = 0 OR n * swyy - swy * swy = 0
            THEN 0.0
            ELSE floor(CAST(n * swxy - swx * swy AS DOUBLE)
                       / sqrt(CAST(n * swxx - swx * swx AS DOUBLE)
                              * CAST(n * swyy - swy * swy AS DOUBLE))
                       * 1000000 + 0.5005) / 1000000 END AS spearman_rho
FROM m
"""


def q_theil_u(sf_dir: str):
    """Theil's uncertainty coefficient U(lang|source) =
    I(lang;source) / H(lang): the ASYMMETRIC "how much does knowing
    the source reduce uncertainty about the language" association —
    the categorical feature-selection number the symmetric Cramér's V
    (q_cramers_v) cannot give. Contingency counts are exact integers
    through one lang×source cell exchange; every MI term
    (n_ij/n)·ln(n·n_ij/(r_i·c_j)) and marginal-entropy term floors to
    1e-9 micro-units so both folds are summation-order immune, and U
    is one quantized division of the two folded doubles."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch["lang"].to_pandas(),
            "source": batch["source"].to_pandas(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["lang", "source"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "source"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = g.pivot_table(index="lang", columns="source", values="n",
                        fill_value=0, aggfunc="sum")
    o = piv.to_numpy(np.int64)
    row = o.sum(axis=1, keepdims=True)
    col = o.sum(axis=0, keepdims=True)
    n = int(o.sum())
    nf = np.float64(n)
    nz = o > 0
    pij = o.astype(np.float64) / nf
    arg = np.where(nz,
                   nf * o.astype(np.float64)
                   / (row.astype(np.float64) * col.astype(np.float64)),
                   1.0)
    t = np.where(nz, pij * np.log(arg), 0.0)
    mi = np.float64(
        int(np.floor(t * 1e9 + 0.5005).astype(np.int64).sum())) / 1e9
    pr = row.astype(np.float64).ravel() / nf  # marginals are all > 0
    th = -pr * np.log(pr)
    hx = np.float64(
        int(np.floor(th * 1e9 + 0.5005).astype(np.int64).sum())) / 1e9
    u = 0.0 if hx <= 0 else float(_q6(mi / hx))
    return pd.DataFrame({
        "n": [n], "h_lang": [float(_q6(hx))], "mi": [float(_q6(mi))],
        "theil_u": [u],
    })


Q_THEIL_U_SQL = """
WITH o AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY lang, source),
rl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS r FROM o GROUP BY lang),
cl AS (SELECT source, CAST(SUM(n) AS BIGINT) AS c FROM o GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM o),
mi AS (SELECT CAST(SUM(CAST(floor(
          (CAST(o.n AS DOUBLE) / CAST(t.nn AS DOUBLE))
          * ln(CAST(t.nn AS DOUBLE) * CAST(o.n AS DOUBLE)
               / (CAST(rl.r AS DOUBLE) * CAST(cl.c AS DOUBLE)))
          * 1000000000 + 0.5005) AS BIGINT)) AS HUGEINT) AS f
      FROM o JOIN rl USING (lang) JOIN cl USING (source) CROSS JOIN t),
hx AS (SELECT CAST(SUM(CAST(floor(
          -(CAST(r AS DOUBLE) / CAST(t.nn AS DOUBLE))
          * ln(CAST(r AS DOUBLE) / CAST(t.nn AS DOUBLE))
          * 1000000000 + 0.5005) AS BIGINT)) AS HUGEINT) AS f
       FROM rl CROSS JOIN t)
SELECT CAST(t.nn AS BIGINT) AS n,
       floor(CAST(hx.f AS DOUBLE) / 1000000000 * 1000000 + 0.5005)
         / 1000000 AS h_lang,
       floor(CAST(mi.f AS DOUBLE) / 1000000000 * 1000000 + 0.5005)
         / 1000000 AS mi,
       CASE WHEN CAST(hx.f AS DOUBLE) <= 0 THEN 0.0
            ELSE floor((CAST(mi.f AS DOUBLE) / 1000000000)
                       / (CAST(hx.f AS DOUBLE) / 1000000000)
                       * 1000000 + 0.5005) / 1000000 END AS theil_u
FROM t CROSS JOIN mi CROSS JOIN hx
"""


def q_gini(sf_dir: str):
    """Gini coefficient of per-customer revenue — the inequality
    summary behind every "top X% of customers drive Y%" claim (the
    scalar twin of q_abc's Pareto classes). Per-customer cents reduce
    through one entity exchange; the driver fold sorts the
    customer-dimension-sized totals ascending and evaluates
    G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) with exact integer sums — the
    sum Σ i·xᵢ is invariant to tie order because equal values commute
    inside a tie block, so no tie-break is needed. One quantized
    division. At 100 TB the rank-weighted sum distributes as a
    two-pass prefix count over value cells."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": batch["o_custkey"].to_numpy(),
            "rev": np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("o_custkey", as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    x = np.sort(g["rev"].to_numpy(np.int64))
    n = len(x)
    ranks = np.arange(1, n + 1, dtype=np.int64)
    s1 = _exact_dot(ranks, x)
    sx = _exact_sum(x)
    num = 2 * s1 - (n + 1) * sx
    den = n * sx
    gini = 0.0 if den == 0 else float(_q6(
        np.float64(float(num)) / np.float64(float(den))))
    return pd.DataFrame({
        "n_cust": [n], "total_cents": [sx], "gini": [gini],
    })


Q_GINI_SQL = """
WITH r AS (SELECT o_custkey,
                  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY o_custkey),
rk AS (SELECT cents,
              ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
       FROM r),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS s1,
             CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS sx
      FROM rk)
SELECT CAST(n AS BIGINT) AS n_cust,
       CAST(sx AS BIGINT) AS total_cents,
       CASE WHEN n * sx = 0 THEN 0.0
            ELSE floor(CAST(2 * s1 - (n + 1) * sx AS DOUBLE)
                       / CAST(n * sx AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END AS gini
FROM m
"""


def t_hazard(sf_dir: str):
    """Discrete-time weekly conversion hazard over the shared
    signup→purchase survival labels (_surv_labels, one entity
    exchange): for every week k since signup, h_k = d_k / n_k where
    n_k counts users whose duration reaches week k (converted OR
    censored later) and d_k counts conversions landing in week k —
    the life-table view product teams read next to the KM curve
    (t_km), including zero-event weeks. Counts are exact integers
    from one bincount + suffix cumsum over the O(users) label frame;
    each hazard is one quantized division."""
    WEEK_US = 604_800_000_000
    u = _surv_labels(sf_dir)
    wk = (u["dur"].to_numpy(np.int64) // WEEK_US)
    ev = u["ev"].to_numpy(bool)
    kmax = int(wk.max())
    per = np.bincount(wk, minlength=kmax + 1).astype(np.int64)
    n_risk = per[::-1].cumsum()[::-1]          # users reaching week k
    d = np.bincount(wk[ev], minlength=kmax + 1).astype(np.int64)
    haz = _q6(d.astype(np.float64) / n_risk.astype(np.float64))
    return pd.DataFrame({
        "week": np.arange(kmax + 1, dtype=np.int64),
        "n_risk": n_risk, "d_events": d,
        "hazard": haz.astype(np.float64),
    })


T_HAZARD_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT s.user_id, MIN(epoch_us(e.ts)) AS t1
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t0
      GROUP BY s.user_id),
u AS (SELECT s.user_id,
             COALESCE(p.t1, (SELECT MAX(epoch_us(ts)) FROM events)) - s.t0
               AS dur,
             p.t1 IS NOT NULL AS ev
      FROM s LEFT JOIN p USING (user_id)),
w AS (SELECT dur // 604800000000 AS wk, ev FROM u),
ks AS (SELECT unnest(generate_series(0, (SELECT MAX(wk) FROM w))) AS k),
h AS (SELECT ks.k,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM w WHERE w.wk >= ks.k)
               AS n_risk,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM w
              WHERE w.wk = ks.k AND w.ev) AS d_events
      FROM ks)
SELECT k AS week, n_risk, d_events,
       floor(CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS hazard
FROM h ORDER BY k
"""


def _event_transitions(sf_dir: str) -> pd.DataFrame:
    """Exact (cur, nxt, n) transition counts of the per-user
    event-type stream, ordered by (ts, event_id) within each user —
    the O(types²) cell table shared by q_entropy_rate and
    t_markov_stationary. One entity shuffle; per-bucket partials
    emitted arrow; tiny driver fold."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"],
               split=True)

    def trans(g: pd.DataFrame) -> pa.Table:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "t": us,
            "e": g["event_id"].to_numpy(np.int64),
            "et": g["event_type"].to_numpy(object),
        }).sort_values(["u", "t", "e"], kind="stable")
        same = df["u"].to_numpy()[1:] == df["u"].to_numpy()[:-1]
        cur = df["et"].to_numpy(object)[:-1][same]
        nxt = df["et"].to_numpy(object)[1:][same]
        out = pd.DataFrame({"cur": cur, "nxt": nxt, "n": 1})
        return pa.Table.from_pandas(
            out.groupby(["cur", "nxt"], as_index=False).sum(),
            preserve_index=False)

    return (
        grouped_map(ds, "user_id", trans)
        .to_pandas()
        .groupby(["cur", "nxt"], as_index=False)["n"].sum()
    )


def q_entropy_rate(sf_dir: str):
    """First-order Markov entropy rate of the per-user event-type
    stream: H(next|cur) = −Σ p(cur,next)·log₂ p(next|cur) over
    transitions counted within each user's (ts, event_id)-ordered
    sequence — the sequence-predictability number that separates
    scripted bots (near 0 bits) from organic sessions. Transitions
    reduce to an O(types²) cell exchange through one entity shuffle
    (per-bucket partials emitted arrow); every ln term floors to 1e-9
    micro-units and the nats→bits conversion multiplies both engines'
    identical folded double by the same 1/ln2 literal."""
    g = _event_transitions(sf_dir)
    n_all = int(g["n"].sum())
    row = g.groupby("cur")["n"].sum()
    nc = row.loc[g["cur"]].to_numpy(np.int64)
    ncx = g["n"].to_numpy(np.int64)
    t = -(ncx.astype(np.float64) / np.float64(n_all)) * np.log(
        ncx.astype(np.float64) / nc.astype(np.float64))
    h_nats = np.float64(
        int(np.floor(t * 1e9 + 0.5005).astype(np.int64).sum())) / 1e9
    h_bits = _q6(h_nats * 1.4426950408889634)
    return pd.DataFrame({
        "n_transitions": [n_all], "n_cells": [len(g)],
        "h_bits": [float(h_bits)],
    })


Q_ENTROPY_RATE_SQL = """
WITH s AS (SELECT event_type AS cur,
                  LEAD(event_type) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS nxt
           FROM events),
c AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY cur, nxt),
rc AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS ncur FROM c GROUP BY cur),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS cells FROM c),
f AS (SELECT CAST(SUM(CAST(floor(
          -(CAST(c.n AS DOUBLE) / CAST(t.nn AS DOUBLE))
          * ln(CAST(c.n AS DOUBLE) / CAST(rc.ncur AS DOUBLE))
          * 1000000000 + 0.5005) AS BIGINT)) AS HUGEINT) AS v
      FROM c JOIN rc USING (cur) CROSS JOIN t)
SELECT t.nn AS n_transitions, t.cells AS n_cells,
       floor(CAST(f.v AS DOUBLE) / 1000000000 * 1.4426950408889634
             * 1000000 + 0.5005) / 1000000 AS h_bits
FROM t CROSS JOIN f
"""


def d_burrows_delta(sf_dir: str):
    """Burrows' Delta stylometric distance between every source pair
    (Burrows 2002): over the corpus top-K=30 tokens, z-score each
    source's relative frequency across sources and average |z_a−z_b|
    — the authorship/register distance that token-overlap measures
    (d_js_matrix) blur because it weights every marker word equally.
    Scaled relative frequencies r = n_st·10⁹ // n_s are EXACT
    integers, the per-token mean cancels inside |z_a−z_b| =
    |r_a−r_b|·S / sqrt(S·Σr²−(Σr)²) so each term is one division of
    identical doubles built from exact HUGEINT moments, micro-floored
    at 1e-9; one vocabulary-sized exchange feeds all O(S²) pairs."""
    from ray.data.aggregate import Sum

    K = 30
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "tok": ex.to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "tok"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot = g.groupby("tok")["n"].sum().reset_index()
    tot = tot.sort_values(["n", "tok"], ascending=[False, True],
                          kind="stable")
    top = tot["tok"].head(K).tolist()
    k = len(top)
    ns = g.groupby("source")["n"].sum()
    srcs = sorted(ns.index)
    S = len(srcs)
    sub = g[g["tok"].isin(top)].pivot_table(
        index="tok", columns="source", values="n", fill_value=0,
        aggfunc="sum").reindex(index=top, columns=srcs, fill_value=0)
    r = {s: [(int(v) * 10**9) // int(ns[s]) for v in sub[s]]
         for s in srcs}
    rows = []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            fold = 0
            for ti in range(k):
                vals = [r[s][ti] for s in srcs]
                d_t = S * sum(v * v for v in vals) - sum(vals) ** 2
                if d_t == 0:
                    continue
                term = (np.float64(float(abs(r[sa][ti] - r[sb][ti]) * S))
                        / np.sqrt(np.float64(float(d_t))))
                fold += int(np.floor(term * 1e9 + 0.5005))
            rows.append((sa, sb, float(_q6(
                np.float64(fold) / 1e9 / np.float64(k)))))
    return pd.DataFrame(rows, columns=["src_a", "src_b", "delta"])


D_BURROWS_DELTA_SQL = """
WITH u AS (SELECT source,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY source, tok),
st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns FROM c
       GROUP BY source),
top AS (SELECT tok FROM
          (SELECT tok, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY tok
           ORDER BY tot DESC, tok LIMIT 30)),
kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM top),
grid AS (SELECT st.source, st.ns, top.tok FROM st CROSS JOIN top),
r AS (SELECT grid.source, grid.tok,
             CAST(COALESCE(c.n, 0) AS HUGEINT) * 1000000000 // grid.ns
               AS rv
      FROM grid LEFT JOIN c
        ON c.source = grid.source AND c.tok = grid.tok),
d AS (SELECT tok, CAST(COUNT(*) AS HUGEINT) AS s,
             CAST(SUM(rv * rv) AS HUGEINT) AS srr,
             CAST(SUM(rv) AS HUGEINT) AS sr
      FROM r GROUP BY tok),
pair AS (SELECT a.source AS sa, b.source AS sb, a.tok,
                abs(a.rv - b.rv) AS dr
         FROM r a JOIN r b ON a.tok = b.tok AND a.source < b.source),
term AS (SELECT p.sa, p.sb,
           CASE WHEN d.s * d.srr - d.sr * d.sr = 0 THEN 0
                ELSE CAST(floor(CAST(p.dr * d.s AS DOUBLE)
                                / sqrt(CAST(d.s * d.srr - d.sr * d.sr
                                            AS DOUBLE))
                                * 1000000000 + 0.5005) AS BIGINT) END AS f
         FROM pair p JOIN d USING (tok))
SELECT sa AS src_a, sb AS src_b,
       floor(CAST(SUM(f) AS DOUBLE) / 1000000000
             / CAST((SELECT k FROM kk) AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS delta
FROM term GROUP BY sa, sb ORDER BY sa, sb
"""


def q_lorenz(sf_dir: str):
    """Lorenz curve of per-customer revenue at customer-count deciles
    — the curve q_gini integrates: cumulative revenue share held by
    the poorest k/10 of customers. Prefix sums at the fixed cut
    positions p_k = ⌊k·n/10⌋ are tie-order invariant (equal values
    commute inside a tie block), so the sorted driver fold needs no
    tie-break; every cut's cumulative cents is an exact integer and
    the share is one quantized division. Same single entity exchange
    as q_gini; at 100 TB the prefix sums distribute as a two-pass
    order statistic over value cells."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": batch["o_custkey"].to_numpy(),
            "rev": np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("o_custkey", as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    x = np.sort(g["rev"].to_numpy(np.int64))
    n = len(x)
    total = _exact_sum(x)
    rows = []
    for k in range(1, 11):
        pk = (k * n) // 10
        cum = _exact_sum(x[:pk])
        rows.append((k, pk, cum, float(_q6(
            np.float64(float(cum)) / np.float64(float(total))))))
    return pd.DataFrame(
        rows, columns=["decile", "n_below", "cum_cents", "cum_share"])


Q_LORENZ_SQL = """
WITH r AS (SELECT o_custkey,
                  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY o_custkey),
rk AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS i FROM r),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS total
      FROM r),
ks AS (SELECT unnest(generate_series(1, 10)) AS k)
SELECT ks.k AS decile,
       (ks.k * t.n) // 10 AS n_below,
       (SELECT CAST(COALESCE(SUM(CAST(cents AS HUGEINT)), 0) AS BIGINT)
        FROM rk WHERE rk.i <= (ks.k * t.n) // 10) AS cum_cents,
       floor(CAST((SELECT COALESCE(SUM(CAST(cents AS HUGEINT)), 0)
                   FROM rk WHERE rk.i <= (ks.k * t.n) // 10) AS DOUBLE)
             / CAST(t.total AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS cum_share
FROM ks CROSS JOIN t ORDER BY ks.k
"""


def q_mcnemar(sf_dir: str):
    """McNemar's test for paired binary outcomes: does the per-user
    ever-clicked flag disagree symmetrically with the ever-purchased
    flag? Only the discordant cells matter — b = clicked-never-
    purchased, c = purchased-never-clicked — and the continuity-
    corrected statistic (|b−c|−1)²/(b+c) is a pure integer ratio
    quantized once (the paired test an unpaired two-proportion z gets
    wrong because both flags live on the same user). Per-user flags
    reduce through one entity exchange of per-batch OR-partials."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def flags(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy().astype(np.int64),
            "clk": (et == "click").astype(np.int64),
            "pur": (et == "purchase").astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).max(),
            preserve_index=False)

    g = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("clk", alias_name="clk"),
                   Max("pur", alias_name="pur"))
        .to_pandas()
    )
    clk = g["clk"].to_numpy(np.int64)
    pur = g["pur"].to_numpy(np.int64)
    b = int(((clk == 1) & (pur == 0)).sum())
    c = int(((clk == 0) & (pur == 1)).sum())
    both = int(((clk == 1) & (pur == 1)).sum())
    neither = int(((clk == 0) & (pur == 0)).sum())
    num = (abs(b - c) - 1) ** 2 if b + c > 0 else 0
    chi2 = 0.0 if b + c == 0 else float(_q6(
        np.float64(num) / np.float64(b + c)))
    return pd.DataFrame({
        "n_users": [len(g)], "both_cnt": [both], "click_only": [b],
        "purchase_only": [c], "neither": [neither], "mcnemar_chi2": [chi2],
    })


Q_MCNEMAR_SQL = """
WITH f AS (SELECT user_id,
                  MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS clk,
                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS pur
           FROM events GROUP BY user_id),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(COUNT(*) FILTER (clk = 1 AND pur = 1) AS BIGINT)
               AS both_cnt,
             CAST(COUNT(*) FILTER (clk = 1 AND pur = 0) AS BIGINT) AS b,
             CAST(COUNT(*) FILTER (clk = 0 AND pur = 1) AS BIGINT) AS c,
             CAST(COUNT(*) FILTER (clk = 0 AND pur = 0) AS BIGINT)
               AS neither
      FROM f)
SELECT n_users, both_cnt, b AS click_only, c AS purchase_only,
       neither,
       CASE WHEN b + c = 0 THEN 0.0
            ELSE floor(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                       / CAST(b + c AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END AS mcnemar_chi2
FROM m
"""


def d_novelty_curve(sf_dir: str):
    """Corpus novelty curve by ingestion-order decile: bucket docs by
    doc_id value into tenths of the id range (doc_id is monotone with
    ingestion in this corpus), then for each bucket report what
    fraction of its token occurrences belong to vocabulary that FIRST
    appears in that bucket — the diminishing-novelty signal that says
    when additional data stops adding new language (the flow twin of
    d_heaps' stock view). Per-batch (bucket, token) count partials
    fold driver-side (vocab×10 cells — the near-unique-key Ray
    groupby trap); first-bucket per token is a vocabulary-sized min.
    Exact integer masses, one quantized share per bucket."""
    from ray.data.aggregate import Max

    mx = _read(sf_dir, "documents", columns=["doc_id"]).aggregate(
        Max("doc_id"))["max(doc_id)"]
    m1 = int(mx) + 1

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        b = (ids * 10) // m1
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "b": b[ex.index.to_numpy(np.int64)],
            "tok": ex.to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["b", "tok"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["b", "tok"], as_index=False)["n"].sum()
    )
    first = g.groupby("tok")["b"].min()
    fb = first.loc[g["tok"]].to_numpy(np.int64)
    bb = g["b"].to_numpy(np.int64)
    nn = g["n"].to_numpy(np.int64)
    novel = fb == bb
    rows = []
    for b in sorted(g["b"].unique()):
        sel = bb == b
        total = int(nn[sel].sum())
        nv = int(nn[sel & novel].sum())
        nt = int((sel & novel).sum())
        rows.append((int(b), total, nv, nt, float(_q6(
            np.float64(nv) / np.float64(total)))))
    return pd.DataFrame(rows, columns=[
        "bucket", "total_toks", "novel_toks", "novel_types",
        "novel_share"])


D_NOVELTY_CURVE_SQL = """
WITH mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
u AS (SELECT doc_id * 10 // mx.m AS b,
             unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) AS tok
      FROM documents CROSS JOIN mx),
c AS (SELECT b, tok, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY b, tok),
f AS (SELECT tok, MIN(b) AS fb FROM c GROUP BY tok)
SELECT c.b AS bucket,
       CAST(SUM(c.n) AS BIGINT) AS total_toks,
       CAST(COALESCE(SUM(c.n) FILTER (f.fb = c.b), 0) AS BIGINT)
         AS novel_toks,
       CAST(COUNT(*) FILTER (f.fb = c.b) AS BIGINT) AS novel_types,
       floor(CAST(COALESCE(SUM(c.n) FILTER (f.fb = c.b), 0) AS DOUBLE)
             / CAST(SUM(c.n) AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS novel_share
FROM c JOIN f USING (tok)
GROUP BY c.b ORDER BY c.b
"""


def q_cochran_armitage(sf_dir: str):
    """Cochran–Armitage trend test: does the return rate
    (l_returnflag = 'R') trend monotonically across ordered quantity
    groups? Weights are the quantity values themselves; the numerator
    clears all means into the exact integer T* = Σwᵢ(N·rᵢ − nᵢ·R) and
    the variance factor A = R·(N−R)·(N·Σw²n − (Σwn)²) is an exact
    Python-int product (HUGEINT twin — far beyond int64), so
    z = T*·√N / √A is built from identical doubles and quantizes
    once. The whole reduction is a 50-cell exchange of per-batch
    (quantity, n, r) partials."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_returnflag"])

    def cells(batch: pa.Table) -> pa.Table:
        rf = batch["l_returnflag"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "w": np.floor(batch["l_quantity"].to_numpy() + 0.5)
                .astype(np.int64),
            "n": 1,
            "r": (rf == "R").astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("w", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("w", as_index=False)[["n", "r"]].sum()
    )
    w = [int(v) for v in g["w"]]
    n = [int(v) for v in g["n"]]
    r = [int(v) for v in g["r"]]
    N, R = sum(n), sum(r)
    t_star = sum(wi * (N * ri - ni * R) for wi, ni, ri in zip(w, n, r))
    swn = sum(wi * ni for wi, ni in zip(w, n))
    swwn = sum(wi * wi * ni for wi, ni in zip(w, n))
    a = R * (N - R) * (N * swwn - swn * swn)
    z = 0.0 if a == 0 else float(_q6(
        np.float64(float(t_star)) * np.sqrt(np.float64(N))
        / np.sqrt(np.float64(float(a)))))
    return pd.DataFrame({
        "n_rows": [N], "n_success": [R], "n_groups": [len(w)],
        "trend_z": [z],
    })


Q_COCHRAN_ARMITAGE_SQL = """
WITH c AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS w,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(COUNT(*) FILTER (l_returnflag = 'R') AS BIGINT)
                    AS r
           FROM lineitem GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn,
             CAST(SUM(r) AS HUGEINT) AS rr FROM c),
m AS (SELECT CAST(SUM(CAST(c.w AS HUGEINT)
                     * (t.nn * c.r - c.n * t.rr)) AS HUGEINT) AS tstar,
             CAST(SUM(CAST(c.w AS HUGEINT) * c.n) AS HUGEINT) AS swn,
             CAST(SUM(CAST(c.w AS HUGEINT) * c.w * c.n) AS HUGEINT)
               AS swwn,
             CAST(COUNT(*) AS BIGINT) AS ngrp
      FROM c CROSS JOIN t),
a AS (SELECT t.nn, t.rr, m.ngrp, m.tstar,
             t.rr * (t.nn - t.rr) * (t.nn * m.swwn - m.swn * m.swn) AS av
      FROM t CROSS JOIN m)
SELECT CAST(nn AS BIGINT) AS n_rows, CAST(rr AS BIGINT) AS n_success,
       ngrp AS n_groups,
       CASE WHEN av = 0 THEN 0.0
            ELSE floor(CAST(tstar AS DOUBLE) * sqrt(CAST(nn AS DOUBLE))
                       / sqrt(CAST(av AS DOUBLE))
                       * 1000000 + 0.5005) / 1000000 END AS trend_z
FROM a
"""


def q_capture_recapture(sf_dir: str):
    """Chapman capture–recapture estimate of the distinct part
    population from two overlapping "samples" — parts touched by
    odd-keyed vs even-keyed orders: N̂ = (n₁+1)(n₂+1)/(m+1) − 1
    (Chapman 1951, the bias-corrected Lincoln–Petersen). The estimate
    every dedup/coverage audit wants when neither sample alone sees
    the whole population. Per-part seen-in-odd/seen-in-even OR-flags
    reduce through one part-keyed exchange; the estimator is one
    quantized rational of exact integer counts."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_orderkey"])

    def flags(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy()
        df = pd.DataFrame({
            "l_partkey": batch["l_partkey"].to_numpy(),
            "odd": (ok % 2 == 1).astype(np.int64),
            "even": (ok % 2 == 0).astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("l_partkey", as_index=False).max(),
            preserve_index=False)

    g = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Max("odd", alias_name="odd"),
                   Max("even", alias_name="even"))
        .to_pandas()
    )
    odd = g["odd"].to_numpy(np.int64)
    even = g["even"].to_numpy(np.int64)
    n1 = int((odd == 1).sum())
    n2 = int((even == 1).sum())
    m = int(((odd == 1) & (even == 1)).sum())
    est = float(_q6(np.float64((n1 + 1) * (n2 + 1))
                    / np.float64(m + 1) - 1.0))
    return pd.DataFrame({
        "n_sample1": [n1], "n_sample2": [n2], "n_both": [m],
        "n_true_distinct": [len(g)], "chapman_estimate": [est],
    })


Q_CAPTURE_RECAPTURE_SQL = """
WITH f AS (SELECT l_partkey,
                  MAX(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)
                    AS odd,
                  MAX(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                    AS even
           FROM lineitem GROUP BY l_partkey),
m AS (SELECT CAST(COUNT(*) FILTER (odd = 1) AS BIGINT) AS n1,
             CAST(COUNT(*) FILTER (even = 1) AS BIGINT) AS n2,
             CAST(COUNT(*) FILTER (odd = 1 AND even = 1) AS BIGINT) AS mm,
             CAST(COUNT(*) AS BIGINT) AS nt
      FROM f)
SELECT n1 AS n_sample1, n2 AS n_sample2, mm AS n_both,
       nt AS n_true_distinct,
       floor((CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(mm + 1 AS DOUBLE)
              - 1.0) * 1000000 + 0.5005) / 1000000 AS chapman_estimate
FROM m
"""


_MS_ITERS = 20


def t_markov_stationary(sf_dir: str):
    """Stationary distribution of the per-user event-type Markov
    chain by EXACT INTEGER power iteration: the state vector lives in
    1e-9 micro-units and every step is v′[x] = Σ_c (v[c]·T[c,x]) ⫽
    row[c] — integer multiply and floor-divide only, so after
    _MS_ITERS = 20 replayed steps both engines hold the bit-identical
    vector (the SQL twin unrolls the same 20 steps as generated CTE
    layers; no float ever enters the iteration). States with no
    outgoing transition keep their mass (self-loop convention,
    applied identically). The long-run visit mix a raw event-type
    histogram misestimates when sessions are short."""
    from ray.data.aggregate import Count

    g = _event_transitions(sf_dir)
    states = sorted(
        r["event_type"]
        for r in _read(sf_dir, "events", columns=["event_type"])
        .groupby("event_type").aggregate(Count()).take_all()
    )
    T = {(c, x): int(n)
         for c, x, n in zip(g["cur"], g["nxt"], g["n"])}
    row = {}
    for (c, _x), n in T.items():
        row[c] = row.get(c, 0) + n
    S = len(states)
    v = {s: 10**9 // S for s in states}
    for _ in range(_MS_ITERS):
        nv = {}
        for x in states:
            acc = sum((v[c] * T[(c, x)]) // row[c]
                      for c in states if (c, x) in T and row.get(c, 0) > 0)
            if row.get(x, 0) == 0:
                acc += v[x]
            nv[x] = acc
        v = nv
    tot = sum(v.values())
    return pd.DataFrame({
        "event_type": states,
        "v_micro": [v[s] for s in states],
        "stationary_p": [float(_q6(np.float64(v[s]) / np.float64(tot)))
                         for s in states],
    })


def _markov_stationary_sql() -> str:
    """Unroll the exact-integer power iteration as _MS_ITERS chained
    CTE layers (recursive CTEs disallow the per-step aggregate)."""
    layers = [
        """states AS MATERIALIZED (SELECT DISTINCT event_type AS state FROM events),
sq AS MATERIALIZED (SELECT event_type AS cur,
              LEAD(event_type) OVER (PARTITION BY user_id
                ORDER BY epoch_us(ts), event_id) AS nxt
       FROM events),
tr AS MATERIALIZED (SELECT cur, nxt, CAST(COUNT(*) AS HUGEINT) AS n
       FROM sq WHERE nxt IS NOT NULL GROUP BY cur, nxt),
ro AS MATERIALIZED (SELECT cur, CAST(SUM(n) AS HUGEINT) AS rn FROM tr GROUP BY cur),
v0 AS MATERIALIZED (SELECT state,
              CAST(1000000000 AS HUGEINT)
                // (SELECT COUNT(*) FROM states) AS v
       FROM states)"""
    ]
    for k in range(1, _MS_ITERS + 1):
        layers.append(f"""v{k} AS MATERIALIZED (
  SELECT s.state,
         COALESCE((SELECT SUM((vp.v * tr.n) // ro.rn)
                   FROM v{k - 1} vp
                   JOIN tr ON tr.cur = vp.state AND tr.nxt = s.state
                   JOIN ro ON ro.cur = vp.state), 0)
         + CASE WHEN NOT EXISTS (SELECT 1 FROM ro WHERE ro.cur = s.state)
                THEN (SELECT vp.v FROM v{k - 1} vp
                      WHERE vp.state = s.state)
                ELSE 0 END AS v
  FROM states s)""")
    final = f"""
SELECT state AS event_type,
       CAST(v AS BIGINT) AS v_micro,
       floor(CAST(v AS DOUBLE)
             / CAST((SELECT SUM(v) FROM v{_MS_ITERS}) AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS stationary_p
FROM v{_MS_ITERS} ORDER BY state"""
    return "WITH " + ",\n".join(layers) + final


T_MARKOV_STATIONARY_SQL = _markov_stationary_sql()


def q_funnel_ordered(sf_dir: str):
    """Strictly-ORDERED per-user funnel view→click→purchase: a click
    counts only at-or-after the user's first view, a purchase only
    at-or-after that first qualifying click — the sequencing
    constraint a naive per-stage distinct-user count ignores (a user
    who purchased before ever viewing is not funnel conversion).
    Stage timestamps are value-compared (>= on epoch µs), so no
    ordering ambiguity exists; per-bucket vectorized min/merge
    partials reduce to four integers and one quantized rate."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"],
               split=True)

    def stage(g: pd.DataFrame) -> pa.Table:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "t": us,
            "et": g["event_type"].to_numpy(object),
        })
        tv = df[df["et"] == "view"].groupby("u")["t"].min()
        c = df[df["et"] == "click"].merge(
            tv.rename("tv").reset_index(), on="u")
        tc = c[c["t"] >= c["tv"]].groupby("u")["t"].min()
        p = df[df["et"] == "purchase"].merge(
            tc.rename("tc").reset_index(), on="u")
        tp = p[p["t"] >= p["tc"]].groupby("u")["t"].min()
        return pa.table({
            "n_users": pa.array([df["u"].nunique()], pa.int64()),
            "n_view": pa.array([len(tv)], pa.int64()),
            "n_view_click": pa.array([len(tc)], pa.int64()),
            "n_full_funnel": pa.array([len(tp)], pa.int64()),
        })

    g = grouped_map(ds, "user_id", stage).to_pandas().sum()
    nv, nf = int(g["n_view"]), int(g["n_full_funnel"])
    return pd.DataFrame({
        "n_users": [int(g["n_users"])], "n_view": [nv],
        "n_view_click": [int(g["n_view_click"])], "n_full_funnel": [nf],
        "funnel_rate": [0.0 if nv == 0 else float(_q6(
            np.float64(nf) / np.float64(nv)))],
    })


Q_FUNNEL_ORDERED_SQL = """
WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
      FROM events e JOIN v ON v.user_id = e.user_id
       AND e.event_type = 'click' AND epoch_us(e.ts) >= v.t
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
      FROM events e JOIN c ON c.user_id = e.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t
      GROUP BY e.user_id),
m AS (SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
               AS n_users,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_full_funnel)
SELECT n_users, n_view, n_view_click, n_full_funnel,
       CASE WHEN n_view = 0 THEN 0.0
            ELSE floor(CAST(n_full_funnel AS DOUBLE)
                       / CAST(n_view AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END AS funnel_rate
FROM m
"""


def q_mde(sf_dir: str):
    """Minimum detectable effect of an odd/even-user A/B split on
    event value, per event type — the pre-experiment power number
    (α = 0.05 two-sided, power 0.80, so the z-sum literal is
    1.959963985 + 0.841621234 = 2.801585219 in BOTH engines):
    MDE = 2.801585219·√(s²_pooled·(1/n_a + 1/n_b)). Per-arm counts
    and cent power sums fold as exact integers through one tiny cell
    exchange; the pooled variance and MDE are built from identical
    doubles and quantize once per type."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "arm": (batch["user_id"].to_numpy() % 2).astype(np.int64),
            "n": 1, "s": v, "ss": v * v,
        })
        return pa.Table.from_pandas(
            df.groupby(["event_type", "arm"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "arm"], as_index=False)[["n", "s", "ss"]]
        .sum()
    )
    rows = []
    for et in sorted(g["event_type"].unique()):
        sub = g[g["event_type"] == et].set_index("arm")
        if 0 not in sub.index or 1 not in sub.index:
            continue
        na, nb = int(sub.loc[1, "n"]), int(sub.loc[0, "n"])
        if na < 2 or nb < 2:
            continue
        ssa = int(na) * int(sub.loc[1, "ss"]) - int(sub.loc[1, "s"]) ** 2
        ssb = int(nb) * int(sub.loc[0, "ss"]) - int(sub.loc[0, "s"]) ** 2
        pooled = (np.float64(float(ssa)) / np.float64(na)
                  + np.float64(float(ssb)) / np.float64(nb)) \
            / np.float64(na + nb - 2)
        mde = _q6(2.801585219
                  * np.sqrt(pooled * (1.0 / np.float64(na)
                                      + 1.0 / np.float64(nb))) / 100.0)
        rows.append((et, na, nb, float(mde)))
    return pd.DataFrame(rows, columns=["event_type", "n_odd", "n_even",
                                       "mde_value"])


Q_MDE_SQL = """
WITH c AS (SELECT event_type, user_id % 2 AS arm,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS HUGEINT) AS s,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS HUGEINT)
                           * CAST(floor(value * 100 + 0.5) AS HUGEINT))
                       AS HUGEINT) AS ss
           FROM events GROUP BY event_type, user_id % 2),
j AS (SELECT a.event_type,
             a.n AS na, b.n AS nb,
             a.n * a.ss - a.s * a.s AS ssa,
             b.n * b.ss - b.s * b.s AS ssb
      FROM c a JOIN c b ON a.event_type = b.event_type
       AND a.arm = 1 AND b.arm = 0
      WHERE a.n >= 2 AND b.n >= 2)
SELECT event_type, CAST(na AS BIGINT) AS n_odd,
       CAST(nb AS BIGINT) AS n_even,
       floor(2.801585219
             * sqrt((CAST(ssa AS DOUBLE) / CAST(na AS DOUBLE)
                     + CAST(ssb AS DOUBLE) / CAST(nb AS DOUBLE))
                    / CAST(na + nb - 2 AS DOUBLE)
                    * (1.0 / CAST(na AS DOUBLE)
                       + 1.0 / CAST(nb AS DOUBLE)))
             / 100.0 * 1000000 + 0.5005) / 1000000 AS mde_value
FROM j ORDER BY event_type
"""


def d_doc_cooccur(sf_dir: str):
    """Document-level co-occurrence PMI between the corpus top-10
    tokens: pmi(a,b) = ln(N·df_ab / (df_a·df_b)) over document
    presence — positive means the two anchors travel together across
    documents (topical coupling), negative means they partition the
    corpus; the DOCUMENT-grain complement of tok_pmi's adjacent-
    bigram association. Top tokens resolve from exact corpus counts
    (count-desc, token tie-break); presence flags reduce per batch to
    a 10×10 upper-triangle int partial via one boolean matmul, so
    the exchange is O(batches·k²); each PMI is one ln of an exact
    integer ratio, quantized once."""
    from ray.data.aggregate import Sum

    K = 10
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tok_cells(batch: pa.Table) -> pa.Table:
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({"tok": ex.to_numpy(), "n": 1})
        return pa.Table.from_pandas(
            df.groupby("tok", as_index=False).sum(), preserve_index=False)

    tot = (
        ds.map_batches(tok_cells, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot = tot.sort_values(["n", "tok"], ascending=[False, True],
                          kind="stable")
    top = tot["tok"].head(K).tolist()
    ti = {t: i for i, t in enumerate(top)}
    k = len(top)

    def pair_part(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_numpy(zero_copy_only=False)) \
            .fillna("")
        ex = texts.str.findall(r"\S+").explode().dropna()
        hit = ex[ex.isin(ti)]
        pres = np.zeros((len(texts), k), dtype=np.int64)
        pres[hit.index.to_numpy(np.int64),
             hit.map(ti).to_numpy(np.int64)] = 1
        co = pres.T @ pres  # df_ab on off-diagonal, df_a on diagonal
        return pa.table({
            "i": pa.array(np.repeat(np.arange(k), k), pa.int64()),
            "j": pa.array(np.tile(np.arange(k), k), pa.int64()),
            "c": pa.array(co.ravel(), pa.int64()),
            "docs": pa.array([len(texts)] + [0] * (k * k - 1), pa.int64()),
        })

    g = (
        ds.map_batches(pair_part, batch_format="pyarrow")
        .to_pandas()
        .groupby(["i", "j"], as_index=False)[["c", "docs"]].sum()
    )
    n_docs = int(g["docs"].sum())
    co = np.zeros((k, k), dtype=np.int64)
    co[g["i"].to_numpy(), g["j"].to_numpy()] = g["c"].to_numpy(np.int64)
    rows = []
    for a in range(k):
        for b in range(a + 1, k):
            cab = int(co[a, b])
            if cab == 0:
                continue
            ca, cb = int(co[a, a]), int(co[b, b])
            pmi = _q6(np.log(np.float64(n_docs * cab)
                             / np.float64(ca * cb)))
            ta, tb = top[a], top[b]
            if tb < ta:
                ta, tb = tb, ta
            rows.append((ta, tb, cab, float(pmi)))
    out = pd.DataFrame(rows, columns=["tok_a", "tok_b", "df_ab", "pmi"])
    return out.sort_values(["tok_a", "tok_b"]).reset_index(drop=True)


D_DOC_COOCCUR_SQL = """
WITH u AS MATERIALIZED (
  SELECT doc_id,
         unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) AS tok
  FROM documents),
top AS MATERIALIZED (
  SELECT tok FROM
    (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY tok
     ORDER BY n DESC, tok LIMIT 10)),
pres AS MATERIALIZED (
  SELECT DISTINCT doc_id, tok FROM u
  WHERE tok IN (SELECT tok FROM top)),
df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM pres GROUP BY tok),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
pair AS (SELECT least(a.tok, b.tok) AS tok_a,
                greatest(a.tok, b.tok) AS tok_b,
                CAST(COUNT(*) AS BIGINT) AS df_ab
         FROM pres a JOIN pres b
           ON a.doc_id = b.doc_id AND a.tok < b.tok
         GROUP BY 1, 2)
SELECT p.tok_a, p.tok_b, p.df_ab,
       floor(ln(CAST(nd.n * p.df_ab AS DOUBLE)
                / CAST(da.c * db.c AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS pmi
FROM pair p
JOIN df da ON da.tok = p.tok_a
JOIN df db ON db.tok = p.tok_b
CROSS JOIN nd
ORDER BY p.tok_a, p.tok_b
"""


def q_kruskal_wallis(sf_dir: str):
    """Kruskal–Wallis rank test of event value across event types —
    the k-group generalization of q_mann_whitney (is ANY type's value
    distribution shifted?). Doubled average ranks over the merged
    value-cent cells keep every group rank sum R2_j an exact integer;
    Σ R2_j²/n_j micro-floors per group (order-immune fold), the tie
    correction Σ(t³−t) is exact, and H and its tie-corrected form
    each quantize once. The exchange is per-batch (type, cent, n)
    partials folded driver-side (near-unique cent key — the
    multi-column Ray groupby trap). SQL twin holds in HUGEINT at
    test scale; the Python ints are unbounded."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": batch["event_type"].to_pandas(),
            "v": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["et", "v"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["et", "v"], as_index=False)["n"].sum()
    )
    marg = g.groupby("v")["n"].sum().sort_index()
    nv = marg.to_numpy(np.int64)
    cum = np.concatenate(([np.int64(0)], np.cumsum(nv)[:-1]))
    r2 = pd.Series(2 * cum + nv + 1, index=marg.index)
    g["r2"] = r2.loc[g["v"]].to_numpy(np.int64)
    N = int(nv.sum())
    fold = 0
    groups = []
    for et in sorted(g["et"].unique()):
        sub = g[g["et"] == et]
        n_j = int(sub["n"].sum())
        r2_j = sum(int(a) * int(b) for a, b in zip(sub["n"], sub["r2"]))
        groups.append((et, n_j))
        fold += int(np.floor(
            np.float64(float(r2_j * r2_j)) / np.float64(n_j)
            * 1e9 + 0.5005))
    srr = np.float64(float(fold)) / 1e9
    nf = np.float64(N)
    h = 3.0 * srr / (nf * (nf + 1.0)) - 3.0 * (nf + 1.0)
    ties = sum(int(t) ** 3 - int(t) for t in nv)
    c = 1.0 - np.float64(float(ties)) / (nf * nf * nf - nf)
    return pd.DataFrame({
        "n": [N], "n_groups": [len(groups)],
        "h": [float(_q6(h))],
        "h_tie_corrected": [float(_q6(h / c)) if c > 0 else 0.0],
    })


Q_KRUSKAL_WALLIS_SQL = """
WITH v AS (SELECT event_type AS et,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS val
           FROM events),
cell AS (SELECT et, val, CAST(COUNT(*) AS BIGINT) AS n
         FROM v GROUP BY et, val),
m AS (SELECT val, CAST(SUM(n) AS BIGINT) AS nv FROM cell GROUP BY val),
r AS (SELECT val, 2 * (SUM(nv) OVER (ORDER BY val) - nv) + nv + 1 AS r2
      FROM m),
gj AS (SELECT c.et, CAST(SUM(c.n) AS HUGEINT) AS nj,
              CAST(SUM(CAST(c.n AS HUGEINT) * r.r2) AS HUGEINT) AS r2j
       FROM cell c JOIN r USING (val) GROUP BY c.et),
t AS (SELECT CAST(SUM(nj) AS HUGEINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS ngrp FROM gj),
fold AS (SELECT CAST(SUM(CAST(floor(
             CAST(r2j * r2j AS DOUBLE) / CAST(nj AS DOUBLE)
             * 1000000000 + 0.5005) AS HUGEINT)) AS HUGEINT) AS f
         FROM gj),
ties AS (SELECT CAST(SUM(CAST(nv AS HUGEINT) * nv * nv - nv) AS HUGEINT)
           AS tt FROM m),
hh AS (SELECT t.nn, t.ngrp,
              3.0 * (CAST(fold.f AS DOUBLE) / 1000000000)
                / (CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) + 1.0))
                - 3.0 * (CAST(t.nn AS DOUBLE) + 1.0) AS h,
              1.0 - CAST(ties.tt AS DOUBLE)
                / (CAST(t.nn AS DOUBLE) * CAST(t.nn AS DOUBLE)
                   * CAST(t.nn AS DOUBLE) - CAST(t.nn AS DOUBLE)) AS c
       FROM t CROSS JOIN fold CROSS JOIN ties)
SELECT CAST(nn AS BIGINT) AS n, ngrp AS n_groups,
       floor(h * 1000000 + 0.5005) / 1000000 AS h,
       CASE WHEN c > 0
            THEN floor(h / c * 1000000 + 0.5005) / 1000000
            ELSE 0.0 END AS h_tie_corrected
FROM hh
"""


def q_gumbel_maxima(sf_dir: str):
    """Gumbel fit to weekly block maxima of hourly net event value —
    the extreme-value capacity question ("how big is a 1-in-K-week
    hour?") that tail percentiles under-answer. Hourly cent sums
    zero-fill the dense grid (silent hours are real zeros), weekly
    maxima over consecutive 168-hour blocks are exact integers, and
    the method-of-moments fit uses the same literals in both engines:
    scale = s·√6/π (0.7796968012336761), loc = mean − γ·scale
    (γ = 0.5772156649015329). One O(hours) cell exchange; moments
    exact; loc/scale quantize once each."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "h": us // 3_600_000_000,
            "c": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    h0, h1 = int(g["h"].min()), int(g["h"].max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[g["h"].to_numpy(np.int64) - h0] = g["c"].to_numpy(np.int64)
    kw = len(grid) // 168
    if kw < 2:
        return pd.DataFrame({"n_weeks": [kw], "mean_max": [0.0],
                             "gumbel_loc": [0.0], "gumbel_scale": [0.0]})
    mx = grid[:kw * 168].reshape(kw, 168).max(axis=1)
    sm = _exact_sum(mx)
    sq = _exact_dot(mx, mx)
    mean = np.float64(float(sm)) / np.float64(kw)
    var = np.float64(float(kw * sq - sm * sm)) \
        / (np.float64(kw) * np.float64(kw - 1))
    scale = 0.7796968012336761 * np.sqrt(var)
    loc = mean - 0.5772156649015329 * scale
    return pd.DataFrame({
        "n_weeks": [kw],
        "mean_max": [float(_q6(mean / 100.0))],
        "gumbel_loc": [float(_q6(loc / 100.0))],
        "gumbel_scale": [float(_q6(scale / 100.0))],
    })


Q_GUMBEL_MAXIMA_SQL = """
WITH b AS (SELECT epoch_us(ts) // 3600000000 AS h,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS c
           FROM events GROUP BY 1),
lim AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM b),
grid AS (SELECT gs.hh AS h, COALESCE(b.c, 0) AS c
         FROM lim, unnest(generate_series(lim.h0, lim.h1)) AS gs(hh)
         LEFT JOIN b ON b.h = gs.hh),
wk AS (SELECT (h - (SELECT h0 FROM lim)) // 168 AS w, MAX(c) AS mx
       FROM grid
       WHERE (h - (SELECT h0 FROM lim)) // 168
             < ((SELECT h1 - h0 + 1 FROM lim) // 168)
       GROUP BY 1),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS k,
             CAST(SUM(CAST(mx AS HUGEINT)) AS HUGEINT) AS sm,
             CAST(SUM(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS sq
      FROM wk),
f AS (SELECT CAST(k AS BIGINT) AS n_weeks,
             CAST(sm AS DOUBLE) / CAST(k AS DOUBLE) AS mean,
             0.7796968012336761
               * sqrt(CAST(k * sq - sm * sm AS DOUBLE)
                      / (CAST(k AS DOUBLE) * CAST(k - 1 AS DOUBLE)))
               AS scale
      FROM m)
SELECT n_weeks,
       floor(mean / 100.0 * 1000000 + 0.5005) / 1000000 AS mean_max,
       floor((mean - 0.5772156649015329 * scale) / 100.0
             * 1000000 + 0.5005) / 1000000 AS gumbel_loc,
       floor(scale / 100.0 * 1000000 + 0.5005) / 1000000 AS gumbel_scale
FROM f
"""


def q_neyman_alloc(sf_dir: str):
    """Neyman allocation of a 10,000-row sample budget across event
    types: n_h ∝ N_h·s_h — the variance-optimal stratified design
    that beats proportional allocation whenever strata variances
    differ. Per-stratum counts and cent power sums fold exactly; each
    stratum weight x_h = N_h·s_h quantizes ONCE to an integer
    milli-weight, after which seats are pure integer arithmetic:
    base = B·xq_h ⫽ Σxq, leftovers by largest remainder with
    event-type tie-break — so both engines land the identical
    allocation with no float comparison anywhere."""
    B = 10_000
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "et": batch["event_type"].to_pandas(),
            "n": 1, "s": v, "ss": v * v,
        })
        return pa.Table.from_pandas(
            df.groupby("et", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("et", as_index=False)[["n", "s", "ss"]].sum()
        .sort_values("et")
    )
    ets = g["et"].tolist()
    xq = []
    for _, r in g.iterrows():
        n_h, s_h, ss_h = int(r["n"]), int(r["s"]), int(r["ss"])
        var = np.float64(float(n_h * ss_h - s_h * s_h)) \
            / (np.float64(n_h) * np.float64(n_h - 1))
        x = np.float64(n_h) * np.sqrt(var)
        xq.append(int(np.floor(x * 1e3 + 0.5005)))
    tot = sum(xq)
    base = [(B * x) // tot for x in xq]
    rem = [(B * x) % tot for x in xq]
    left = B - sum(base)
    order = sorted(range(len(ets)), key=lambda i: (-rem[i], ets[i]))
    alloc = list(base)
    for i in order[:left]:
        alloc[i] += 1
    return pd.DataFrame({
        "event_type": ets,
        "stratum_n": [int(v) for v in g["n"]],
        "weight_milli": xq,
        "alloc": alloc,
    })


Q_NEYMAN_ALLOC_SQL = """
WITH c AS (SELECT event_type AS et,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS HUGEINT) AS s,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS HUGEINT)
                           * CAST(floor(value * 100 + 0.5) AS HUGEINT))
                       AS HUGEINT) AS ss
           FROM events GROUP BY event_type),
x AS (SELECT et, n,
             CAST(floor(CAST(n AS DOUBLE)
                        * sqrt(CAST(n * ss - s * s AS DOUBLE)
                               / (CAST(n AS DOUBLE)
                                  * CAST(n - 1 AS DOUBLE)))
                        * 1000 + 0.5005) AS HUGEINT) AS xq
      FROM c),
t AS (SELECT CAST(SUM(xq) AS HUGEINT) AS tot FROM x),
b AS (SELECT x.et, x.n, x.xq,
             (10000 * x.xq) // t.tot AS base,
             (10000 * x.xq) % t.tot AS rem
      FROM x CROSS JOIN t),
lft AS (SELECT 10000 - CAST(SUM(base) AS BIGINT) AS l FROM b),
rk AS (SELECT et, n, xq, base,
              ROW_NUMBER() OVER (ORDER BY rem DESC, et) AS pos
       FROM b)
SELECT et AS event_type, n AS stratum_n,
       CAST(xq AS BIGINT) AS weight_milli,
       CAST(base + CASE WHEN pos <= (SELECT l FROM lft)
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM rk ORDER BY et
"""


def q_elasticity(sf_dir: str):
    """Price elasticity of demand: the log–log OLS slope
    d ln(quantity)/d ln(price cents) over lineitem — the pricing
    number a linear q-on-p regression (q_grouped_ols) cannot give
    because elasticity is the exponent, not the slope. Both logs are
    taken ONCE per distinct (quantity, cent) cell and micro-floored
    to 1e-9 integers, so the five weighted regression moments fold as
    exact Python ints (HUGEINT twins) over the cell weights and the
    slope is one quantized ratio; the exchange is per-batch cell
    partials folded driver-side (near-unique cent key)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "q": np.floor(batch["l_quantity"].to_numpy() + 0.5)
                .astype(np.int64),
            "p": np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["q", "p"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["q", "p"], as_index=False)["n"].sum()
    )
    lx = np.floor(np.log(g["p"].to_numpy(np.float64)) * 1e9 + 0.5005) \
        .astype(np.int64)
    ly = np.floor(np.log(g["q"].to_numpy(np.float64)) * 1e9 + 0.5005) \
        .astype(np.int64)
    w = g["n"].to_numpy(np.int64)
    n = int(w.sum())
    sx = _exact_dot(w, lx)
    sy = _exact_dot(w, ly)
    sxx = _exact_dot(w, lx.astype(object) * lx.astype(object))
    sxy = _exact_dot(w, lx.astype(object) * ly.astype(object))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = 0.0 if den == 0 else float(_q6(
        np.float64(float(num)) / np.float64(float(den))))
    return pd.DataFrame({"n": [n], "elasticity": [slope]})


Q_ELASTICITY_SQL = """
WITH cell AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
                     CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS p,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem GROUP BY 1, 2),
lg AS (SELECT n,
              CAST(floor(ln(CAST(p AS DOUBLE)) * 1000000000 + 0.5005)
                   AS HUGEINT) AS lx,
              CAST(floor(ln(CAST(q AS DOUBLE)) * 1000000000 + 0.5005)
                   AS HUGEINT) AS ly
       FROM cell),
m AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn,
             CAST(SUM(n * lx) AS HUGEINT) AS sx,
             CAST(SUM(n * ly) AS HUGEINT) AS sy,
             CAST(SUM(n * lx * lx) AS HUGEINT) AS sxx,
             CAST(SUM(n * lx * ly) AS HUGEINT) AS sxy
      FROM lg)
SELECT CAST(nn AS BIGINT) AS n,
       CASE WHEN nn * sxx - sx * sx = 0 THEN 0.0
            ELSE floor(CAST(nn * sxy - sx * sy AS DOUBLE)
                       / CAST(nn * sxx - sx * sx AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END AS elasticity
FROM m
"""


def t_retention_rate(sf_dir: str):
    """Weekly cohort retention matrix: for each signup-week cohort
    and week-age a, the share of the cohort with ANY event in
    calendar week (cohort_week + a) — the table t_cohort_ltv prices
    and t_growth_accounting nets out, at the grain retention curves
    are actually read. One entity shuffle emits per-user (cohort
    week, distinct active week-age) pairs plus cohort-size markers;
    the fold is an O(cohorts × ages) cell sum and one quantized rate
    per cell (week indices are absolute epoch-week integers)."""
    from ..stages.temporal import grouped_map

    WEEK_US = 604_800_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"],
               split=True)

    def pairs(g: pd.DataFrame) -> pa.Table:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64),
            "w": us // WEEK_US,
            "et": g["event_type"].to_numpy(object),
        })
        ws = df[df["et"] == "signup"].groupby("u")["w"].min()
        act = df.merge(ws.rename("ws").reset_index(), on="u")
        act = act[act["w"] >= act["ws"]]
        act["age"] = act["w"] - act["ws"]
        cells = (act[["ws", "age", "u"]].drop_duplicates()
                 .groupby(["ws", "age"], as_index=False)
                 .agg(n=("u", "size")))
        sizes = ws.value_counts().rename_axis("ws").reset_index(name="n")
        sizes["age"] = -1  # cohort-size marker rows
        out = pd.concat([cells, sizes[["ws", "age", "n"]]],
                        ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    g = (
        grouped_map(ds, "user_id", pairs)
        .to_pandas()
        .groupby(["ws", "age"], as_index=False)["n"].sum()
    )
    sizes = g[g["age"] == -1].set_index("ws")["n"]
    cells = g[g["age"] >= 0].copy()
    cells["cohort_size"] = sizes.loc[cells["ws"]].to_numpy(np.int64)
    cells["retention"] = _q6(
        cells["n"].to_numpy(np.float64)
        / cells["cohort_size"].to_numpy(np.float64))
    out = cells.rename(columns={"ws": "cohort_week",
                                "n": "active_users"})
    return out[["cohort_week", "age", "active_users", "cohort_size",
                "retention"]].sort_values(
        ["cohort_week", "age"]).reset_index(drop=True)


T_RETENTION_RATE_SQL = """
WITH s AS (SELECT user_id,
                  MIN(epoch_us(ts)) // 604800000000 AS ws
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, s.ws,
             epoch_us(e.ts) // 604800000000 - s.ws AS age
      FROM events e JOIN s USING (user_id)
      WHERE epoch_us(e.ts) // 604800000000 >= s.ws),
cs AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY ws)
SELECT a.ws AS cohort_week, a.age,
       CAST(COUNT(*) AS BIGINT) AS active_users,
       cs.n AS cohort_size,
       floor(CAST(COUNT(*) AS DOUBLE) / CAST(cs.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS retention
FROM a JOIN cs USING (ws)
GROUP BY a.ws, a.age, cs.n
ORDER BY a.ws, a.age
"""


def d_completeness_audit(sf_dir: str):
    """Column-completeness profile of the documents table — the
    data-quality gate every ingestion runs before anything else:
    NULL text, empty-string text, whitespace-only text, NULL lang,
    duplicate doc_id multiplicity (rows minus distinct keys), and
    the usable-row rate. Pure integer counters from vectorized
    per-batch partials (one regex for whitespace-only); the only
    float is the final quantized rate."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def part(batch: pa.Table) -> pa.Table:
        txt = pd.Series(batch["text"].to_numpy(zero_copy_only=False))
        lang = pd.Series(batch["lang"].to_numpy(zero_copy_only=False))
        isnull = txt.isna()
        empty = (~isnull) & (txt == "")
        wsonly = (~isnull) & txt.str.fullmatch(r"\s+").fillna(False)
        ids = pd.Series(batch["doc_id"].to_numpy())
        dd = ids.drop_duplicates()
        return pa.table({
            "rows": pa.array([len(txt)], pa.int64()),
            "null_text": pa.array([int(isnull.sum())], pa.int64()),
            "empty_text": pa.array([int(empty.sum())], pa.int64()),
            "ws_only_text": pa.array([int(wsonly.sum())], pa.int64()),
            "null_lang": pa.array([int(lang.isna().sum())], pa.int64()),
            "batch_dup_ids": pa.array([len(ids) - len(dd)], pa.int64()),
        })

    from ray.data.aggregate import Count

    g = ds.map_batches(part, batch_format="pyarrow").to_pandas().sum()
    n_ids = _read(sf_dir, "documents", columns=["doc_id"]) \
        .groupby("doc_id").aggregate(Count()).count()
    n = int(g["rows"])
    bad = int(g["null_text"]) + int(g["empty_text"]) \
        + int(g["ws_only_text"])
    return pd.DataFrame({
        "rows": [n],
        "null_text": [int(g["null_text"])],
        "empty_text": [int(g["empty_text"])],
        "ws_only_text": [int(g["ws_only_text"])],
        "null_lang": [int(g["null_lang"])],
        "dup_doc_ids": [n - int(n_ids)],
        "usable_rate": [float(_q6(np.float64(n - bad) / np.float64(n)))],
    })


D_COMPLETENESS_AUDIT_SQL = """
WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS rows_,
                  CAST(COUNT(*) FILTER (text IS NULL) AS BIGINT)
                    AS null_text,
                  CAST(COUNT(*) FILTER (text = '') AS BIGINT)
                    AS empty_text,
                  CAST(COUNT(*) FILTER (text IS NOT NULL
                        AND regexp_matches(text, '^\\s+$')) AS BIGINT)
                    AS ws_only_text,
                  CAST(COUNT(*) FILTER (lang IS NULL) AS BIGINT)
                    AS null_lang,
                  CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
                    AS dup_doc_ids
           FROM documents)
SELECT rows_ AS rows, null_text, empty_text, ws_only_text, null_lang,
       dup_doc_ids,
       floor(CAST(rows_ - null_text - empty_text - ws_only_text
                  AS DOUBLE) / CAST(rows_ AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS usable_rate
FROM m
"""


def t_reorder_gap(sf_dir: str):
    """Inter-order gap distribution: day gaps between each customer's
    consecutive orders, summarized by EXACT element selections —
    median and p90 are the rank-⌈q·n⌉ members of the global gap
    multiset (no quantizer touches them; the multiset is invariant to
    same-day tie order because equal days diff to zero). Per-customer
    diffs run inside one entity shuffle; day gaps are small integers,
    so the exchange is an O(distinct gaps) value-cell fold and the
    percentiles resolve from cumulative counts. Only the mean
    quantizes."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
               split=True)

    def gaps(g: pd.DataFrame) -> pa.Table:
        day = (g["o_orderdate"].to_numpy("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        df = pd.DataFrame({
            "u": g["o_custkey"].to_numpy(np.int64), "d": day,
        }).sort_values(["u", "d"], kind="stable")
        u = df["u"].to_numpy()
        d = df["d"].to_numpy()
        same = u[1:] == u[:-1]
        gap = (d[1:] - d[:-1])[same]
        out = pd.DataFrame({"gap": gap, "n": 1})
        return pa.Table.from_pandas(
            out.groupby("gap", as_index=False).sum(), preserve_index=False)

    g = (
        grouped_map(ds, "o_custkey", gaps)
        .to_pandas()
        .groupby("gap", as_index=False)["n"].sum()
        .sort_values("gap")
    )
    vals = g["gap"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)

    def at_rank(r: int) -> int:
        return int(vals[np.searchsorted(cum, r, side="left")])

    med = at_rank((n + 1) // 2)
    p90 = at_rank((9 * n + 9) // 10)
    tot = _exact_dot(vals, cnt)
    return pd.DataFrame({
        "n_gaps": [n], "median_gap_days": [med], "p90_gap_days": [p90],
        "mean_gap_days": [float(_q6(np.float64(float(tot))
                                    / np.float64(n)))],
    })


T_REORDER_GAP_SQL = """
WITH d AS (SELECT o_custkey,
                  epoch_us(o_orderdate) // 86400000000 AS day,
                  o_orderkey
           FROM orders),
l AS (SELECT o_custkey,
             day - LAG(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day, o_orderkey) AS gap
      FROM d),
gp AS (SELECT gap FROM l WHERE gap IS NOT NULL),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(gap AS HUGEINT)) AS HUGEINT) AS s FROM gp),
rk AS (SELECT gap, ROW_NUMBER() OVER (ORDER BY gap) AS i FROM gp)
SELECT t.n AS n_gaps,
       (SELECT gap FROM rk WHERE i = (t.n + 1) // 2)
         AS median_gap_days,
       (SELECT gap FROM rk WHERE i = (9 * t.n + 9) // 10)
         AS p90_gap_days,
       floor(CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_gap_days
FROM t
"""


def d_char_entropy(sf_dir: str):
    """Per-source CHARACTER-level Shannon entropy in bits — the
    alphabet-health audit below d_doc_entropy's word grain: OCR
    noise, encoding mojibake and binary bleed-through all push char
    entropy away from the source's baseline. Per-batch per-source
    Counter folds (C-speed over the concatenated text; code-point
    grain in both engines) reduce to an O(sources × alphabet) cell
    exchange; ln terms micro-floor at 1e-9 and the bits conversion
    multiplies identical doubles by the same 1/ln2 literal."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_numpy(zero_copy_only=False),
            "text": pd.Series(
                batch["text"].to_numpy(zero_copy_only=False)).fillna(""),
        })
        rows = []
        for src, g in df.groupby("source"):
            for ch, n in Counter("".join(g["text"])).items():
                rows.append((src, ch, n))
        out = pd.DataFrame(rows, columns=["source", "ch", "n"])
        return pa.Table.from_pandas(out, preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "ch"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for src in sorted(g["source"].unique()):
        sub = g[g["source"] == src]
        n = sub["n"].to_numpy(np.int64)
        tot = int(n.sum())
        p = n.astype(np.float64) / np.float64(tot)
        t = -p * np.log(p)
        fold = int(np.floor(t * 1e9 + 0.5005).astype(np.int64).sum())
        rows.append((src, tot, len(sub), float(_q6(
            np.float64(fold) / 1e9 * 1.4426950408889634))))
    return pd.DataFrame(rows, columns=["source", "n_chars",
                                       "n_distinct_chars", "h_bits"])


D_CHAR_ENTROPY_SQL = """
WITH u AS (SELECT source,
                  unnest(string_split(coalesce(text, ''), '')) AS ch
           FROM documents),
c AS (SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS n
      FROM u WHERE ch <> '' GROUP BY source, ch),
st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot,
              CAST(COUNT(*) AS BIGINT) AS k FROM c GROUP BY source),
f AS (SELECT c.source,
             CAST(SUM(CAST(floor(
                 -(CAST(c.n AS DOUBLE) / CAST(st.tot AS DOUBLE))
                 * ln(CAST(c.n AS DOUBLE) / CAST(st.tot AS DOUBLE))
                 * 1000000000 + 0.5005) AS BIGINT)) AS HUGEINT) AS v
      FROM c JOIN st USING (source) GROUP BY c.source)
SELECT st.source, st.tot AS n_chars, st.k AS n_distinct_chars,
       floor(CAST(f.v AS DOUBLE) / 1000000000 * 1.4426950408889634
             * 1000000 + 0.5005) / 1000000 AS h_bits
FROM st JOIN f USING (source) ORDER BY st.source
"""


def t_seasonal_strength(sf_dir: str):
    """Hour-of-day seasonal strength of the hourly value series:
    η² = SSB/SST of the 24 hour-of-day groups over the DENSE
    zero-filled grid — 1 means the daily cycle explains everything,
    0 means no cycle (the scalar t_seasonality's 24-row profile
    summarizes). Exactized by the variance-decomposition identity:
    every per-group term (S_h²·10⁹) ⫽ n_h is an exact integer floor
    division (NO float enters the fold), SSB and SST clear the grand
    mean as exact integers, and η² plus the peak hour (argmax by the
    same integer mean key, hour tie-break) are the only quantized /
    selected outputs. One O(hours) cell exchange."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "h": us // 3_600_000_000,
            "c": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    h0, h1 = int(g["h"].min()), int(g["h"].max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[g["h"].to_numpy(np.int64) - h0] = g["c"].to_numpy(np.int64)
    hod = (np.arange(h0, h1 + 1, dtype=np.int64)) % 24
    N = len(grid)
    sx = _exact_sum(grid)
    sxx = _exact_dot(grid, grid)
    a = 0
    best = None
    for h in range(24):
        sel = hod == h
        n_h = int(sel.sum())
        if n_h == 0:
            continue
        s_h = _exact_sum(grid[sel])
        a += (s_h * s_h * 10**9) // n_h
        key = (s_h * 10**9) // n_h  # integer mean in nano-cents
        if best is None or key > best[0]:
            best = (key, h)
    ssb = N * a - sx * sx * 10**9
    sst = (N * sxx - sx * sx) * 10**9
    eta2 = 0.0 if sst == 0 else float(_q6(
        np.float64(float(ssb)) / np.float64(float(sst))))
    return pd.DataFrame({
        "n_hours": [N], "seasonal_strength": [eta2],
        "peak_hour": [int(best[1])],
    })


T_SEASONAL_STRENGTH_SQL = """
WITH b AS (SELECT epoch_us(ts) // 3600000000 AS h,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS c
           FROM events GROUP BY 1),
lim AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM b),
grid AS MATERIALIZED (
  SELECT gs.hh AS h, gs.hh % 24 AS hod,
         CAST(COALESCE(b.c, 0) AS HUGEINT) AS c
  FROM lim, unnest(generate_series(lim.h0, lim.h1)) AS gs(hh)
  LEFT JOIN b ON b.h = gs.hh),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS sx,
             CAST(SUM(c * c) AS HUGEINT) AS sxx FROM grid),
hg AS (SELECT hod, CAST(COUNT(*) AS HUGEINT) AS nh,
              CAST(SUM(c) AS HUGEINT) AS sh
       FROM grid GROUP BY hod),
agg AS (SELECT CAST(SUM((sh * sh * 1000000000) // nh) AS HUGEINT) AS a
        FROM hg),
pk AS (SELECT hod FROM hg
       ORDER BY (sh * 1000000000) // nh DESC, hod LIMIT 1)
SELECT CAST(t.n AS BIGINT) AS n_hours,
       CASE WHEN (t.n * t.sxx - t.sx * t.sx) = 0 THEN 0.0
            ELSE floor(CAST(t.n * agg.a - t.sx * t.sx * 1000000000
                            AS DOUBLE)
                       / CAST((t.n * t.sxx - t.sx * t.sx)
                              * 1000000000 AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END
         AS seasonal_strength,
       (SELECT CAST(hod AS BIGINT) FROM pk) AS peak_hour
FROM t CROSS JOIN agg
"""


def q_simpson_check(sf_dir: str):
    """Simpson's-paradox audit: Pearson correlation of quantity vs
    discount per returnflag group NEXT TO the aggregate correlation,
    flagging groups whose sign flips — the confounding trap a single
    pooled corr (q_corr) hides. Discounts scale to exact basis
    points, all five moments per group fold as exact integers
    (aggregate moments are their exact sums), each correlation
    quantizes once, and the flip flag is a sign product of the two
    quantized doubles — identical in both engines."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_discount"])

    def cells(batch: pa.Table) -> pa.Table:
        x = np.floor(batch["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        y = np.floor(batch["l_discount"].to_numpy() * 10000 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "rf": batch["l_returnflag"].to_pandas(),
            "n": 1, "sx": x, "sy": y,
            "sxx": x * x, "syy": y * y, "sxy": x * y,
        })
        return pa.Table.from_pandas(
            df.groupby("rf", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("rf", as_index=False)[["n", "sx", "sy", "sxx", "syy",
                                        "sxy"]].sum()
    )

    def corr(n, sx, sy, sxx, syy, sxy):
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        if dx == 0 or dy == 0:
            return 0.0
        return float(_q6(np.float64(float(num))
                         / np.sqrt(np.float64(float(dx))
                                   * np.float64(float(dy)))))

    tot = [int(g[c].sum()) for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]]
    c_all = corr(*tot)
    rows = []
    for _, r in g.sort_values("rf").iterrows():
        cg = corr(*(int(r[c]) for c in ["n", "sx", "sy", "sxx", "syy",
                                        "sxy"]))
        rows.append((r["rf"], int(r["n"]), cg, c_all,
                     int(cg * c_all < 0)))
    return pd.DataFrame(rows, columns=["returnflag", "n", "group_corr",
                                       "agg_corr", "sign_flip"])


Q_SIMPSON_CHECK_SQL = """
WITH v AS (SELECT l_returnflag AS rf,
                  CAST(floor(l_quantity + 0.5) AS HUGEINT) AS x,
                  CAST(floor(l_discount * 10000 + 0.5) AS HUGEINT) AS y
           FROM lineitem),
m AS (SELECT rf, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
      FROM v GROUP BY rf),
t AS (SELECT CAST(SUM(n) AS HUGEINT) AS n,
             CAST(SUM(sx) AS HUGEINT) AS sx,
             CAST(SUM(sy) AS HUGEINT) AS sy,
             CAST(SUM(sxx) AS HUGEINT) AS sxx,
             CAST(SUM(syy) AS HUGEINT) AS syy,
             CAST(SUM(sxy) AS HUGEINT) AS sxy FROM m),
ca AS (SELECT CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                   THEN 0.0
                   ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                     * CAST(n * syy - sy * sy AS DOUBLE))
                              * 1000000 + 0.5005) / 1000000 END AS c
       FROM t),
cg AS (SELECT rf, CAST(n AS BIGINT) AS n,
              CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                   THEN 0.0
                   ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                     * CAST(n * syy - sy * sy AS DOUBLE))
                              * 1000000 + 0.5005) / 1000000 END AS c
       FROM m)
SELECT cg.rf AS returnflag, cg.n, cg.c AS group_corr, ca.c AS agg_corr,
       CAST(cg.c * ca.c < 0 AS BIGINT) AS sign_flip
FROM cg CROSS JOIN ca ORDER BY cg.rf
"""


def t_peak_window(sf_dir: str):
    """Peak 6-hour window: the maximum number of events in any six
    consecutive hours of the dense zero-filled grid, with its
    earliest start hour — the burst-capacity number a per-hour max
    understates (bursts straddle hour boundaries). Rolling sums over
    the O(hours) count-cell exchange are exact integers; the argmax
    takes the earliest window on ties in both engines; peak-to-mean
    is the one quantized ratio of exact integers."""
    from ray.data.aggregate import Sum

    W = 6
    ds = _read(sf_dir, "events", columns=["ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({"h": us // 3_600_000_000, "n": 1})
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    h0, h1 = int(g["h"].min()), int(g["h"].max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    total = int(grid.sum())
    n_hours = len(grid)
    cs = np.concatenate(([np.int64(0)], np.cumsum(grid)))
    win = cs[W:] - cs[:-W] if n_hours >= W else cs[-1:] - cs[:1]
    peak = int(win.max())
    start = h0 + int(np.argmax(win))  # earliest on ties
    ptm = float(_q6(np.float64(peak * n_hours)
                    / np.float64(W * total)))
    return pd.DataFrame({
        "n_hours": [n_hours], "window_hours": [W],
        "peak_events": [peak], "peak_start_hour": [start],
        "peak_to_mean": [ptm],
    })


T_PEAK_WINDOW_SQL = """
WITH b AS (SELECT epoch_us(ts) // 3600000000 AS h,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
lim AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM b),
grid AS MATERIALIZED (
  SELECT gs.hh AS h, COALESCE(b.n, 0) AS n
  FROM lim, unnest(generate_series(lim.h0, lim.h1)) AS gs(hh)
  LEFT JOIN b ON b.h = gs.hh),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(n) AS BIGINT) AS total FROM grid),
w AS (SELECT h,
             SUM(n) OVER (ORDER BY h
                          ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING)
               AS s
      FROM grid),
wf AS (SELECT h, s FROM w
       WHERE h <= (SELECT h1 - 5 FROM lim) OR (SELECT h1 - h0 + 1 < 6
                                               FROM lim)),
pk AS (SELECT h, s FROM wf ORDER BY s DESC, h LIMIT 1)
SELECT t.n_hours, 6 AS window_hours,
       CAST(pk.s AS BIGINT) AS peak_events,
       pk.h AS peak_start_hour,
       floor(CAST(pk.s * t.n_hours AS DOUBLE)
             / CAST(6 * t.total AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS peak_to_mean
FROM pk CROSS JOIN t
"""


def _ntile5(rank: np.ndarray, n: int) -> np.ndarray:
    """SQL NTILE(5) replicated in integer arithmetic: the first
    n mod 5 buckets take the ceiling size (the t_rfm pattern)."""
    c, m = n // 5, n % 5
    big = m * (c + 1)
    return np.where(rank <= big,
                    (rank - 1) // (c + 1) + 1,
                    m + (rank - big - 1) // max(c, 1) + 1).astype(np.int64)


def t_segment_migration(sf_dir: str):
    """Monetary-quintile migration matrix: each user's purchase-spend
    NTILE(5) in the first half of the observation window vs the
    second (split at the exact integer midpoint µs), counted over
    users who purchased in BOTH halves — the segment-churn table
    behind "do our whales stay whales?". Quintiles replay SQL
    NTILE semantics with pure integer rank arithmetic over the
    deterministic (spend, user_id) order; per-user half-spends reduce
    through one entity exchange; every output is an integer count."""
    from ray.data.aggregate import Max, Min, Sum

    lim = _read(sf_dir, "events", columns=["ts"]).aggregate(
        Min("ts"), Max("ts"))
    t0 = int(np.datetime64(lim["min(ts)"], "us").astype(np.int64))
    t1 = int(np.datetime64(lim["max(ts)"], "us").astype(np.int64))
    mid = (t0 + t1) // 2

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type",
                                          "value"])

    def cells(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        keep = et == "purchase"
        v = np.floor(batch["value"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)[keep]
        u = batch["user_id"].to_numpy()[keep]
        first = (us[keep] < mid)
        df = pd.DataFrame({
            "u": u,
            "s1": np.where(first, v, 0), "c1": first.astype(np.int64),
            "s2": np.where(first, 0, v),
            "c2": (~first).astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("u", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Sum("s1", alias_name="s1"), Sum("c1", alias_name="c1"),
                   Sum("s2", alias_name="s2"), Sum("c2", alias_name="c2"))
        .to_pandas()
    )
    both = g[(g["c1"] > 0) & (g["c2"] > 0)].copy()
    n = len(both)
    order1 = np.lexsort((both["u"].to_numpy(np.int64),
                         both["s1"].to_numpy(np.int64)))
    order2 = np.lexsort((both["u"].to_numpy(np.int64),
                         both["s2"].to_numpy(np.int64)))
    r1 = np.empty(n, dtype=np.int64)
    r1[order1] = np.arange(1, n + 1)
    r2 = np.empty(n, dtype=np.int64)
    r2[order2] = np.arange(1, n + 1)
    both["q1"] = _ntile5(r1, n)
    both["q2"] = _ntile5(r2, n)
    out = (both.groupby(["q1", "q2"], as_index=False)
           .agg(n_users=("u", "size"))
           .sort_values(["q1", "q2"]).reset_index(drop=True))
    return out


T_SEGMENT_MIGRATION_SQL = """
WITH lim AS (SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
             FROM events),
p AS (SELECT user_id,
             CAST(SUM(CASE WHEN epoch_us(ts)
                              < (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS s1,
             CAST(COUNT(*) FILTER (epoch_us(ts)
                              < (SELECT (t0 + t1) // 2 FROM lim))
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN epoch_us(ts)
                              >= (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS s2,
             CAST(COUNT(*) FILTER (epoch_us(ts)
                              >= (SELECT (t0 + t1) // 2 FROM lim))
                  AS BIGINT) AS c2
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
b AS (SELECT user_id, s1, s2 FROM p WHERE c1 > 0 AND c2 > 0),
q AS (SELECT user_id,
             NTILE(5) OVER (ORDER BY s1, user_id) AS q1,
             NTILE(5) OVER (ORDER BY s2, user_id) AS q2
      FROM b)
SELECT CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM q GROUP BY q1, q2 ORDER BY q1, q2
"""


def q_price_index(sf_dir: str):
    """Laspeyres, Paasche and Fisher price indices between the first
    and second halves of the shipping window (split at the exact
    integer midpoint µs), over parts traded in BOTH halves — the
    index-number econometrics a plain average-price delta gets wrong
    under mix shift. Per-part half prices are rationals C/Q of exact
    cent and quantity sums; every cross term (C1·Q0) ⫽ Q1 is an exact
    integer FLOOR DIVISION (no float enters the folds), the Laspeyres
    denominator collapses to ΣC0 exactly, and Fisher is one sqrt of
    the product of the two once-quantized indices."""
    from ray.data.aggregate import Max, Min

    lim = _read(sf_dir, "lineitem", columns=["l_shipdate"]).aggregate(
        Min("l_shipdate"), Max("l_shipdate"))
    t0 = int(np.datetime64(lim["min(l_shipdate)"], "us").astype(np.int64))
    t1 = int(np.datetime64(lim["max(l_shipdate)"], "us").astype(np.int64))
    mid = (t0 + t1) // 2

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_quantity",
                        "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["l_shipdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        first = us < mid
        q = np.floor(batch["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        c = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "p": batch["l_partkey"].to_numpy(),
            "q0": np.where(first, q, 0), "c0": np.where(first, c, 0),
            "q1": np.where(first, 0, q), "c1": np.where(first, 0, c),
        })
        return pa.Table.from_pandas(
            df.groupby("p", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("p", as_index=False)[["q0", "c0", "q1", "c1"]].sum()
    )
    both = g[(g["q0"] > 0) & (g["q1"] > 0)]
    sum_c0 = sum(int(v) for v in both["c0"])
    sum_c1 = sum(int(v) for v in both["c1"])
    lnum = sum((int(c1) * int(q0)) // int(q1)
               for c1, q0, q1 in zip(both["c1"], both["q0"], both["q1"]))
    pden = sum((int(c0) * int(q1)) // int(q0)
               for c0, q1, q0 in zip(both["c0"], both["q1"], both["q0"]))
    lasp = float(_q6(np.float64(float(lnum)) / np.float64(float(sum_c0))))
    paas = float(_q6(np.float64(float(sum_c1)) / np.float64(float(pden))))
    fisher = float(_q6(np.sqrt(np.float64(lasp) * np.float64(paas))))
    return pd.DataFrame({
        "n_parts_both": [len(both)], "laspeyres": [lasp],
        "paasche": [paas], "fisher": [fisher],
    })


Q_PRICE_INDEX_SQL = """
WITH lim AS (SELECT MIN(epoch_us(l_shipdate)) AS t0,
                    MAX(epoch_us(l_shipdate)) AS t1 FROM lineitem),
c AS (SELECT l_partkey AS p,
             CAST(SUM(CASE WHEN epoch_us(l_shipdate)
                              < (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
                           ELSE 0 END) AS HUGEINT) AS q0,
             CAST(SUM(CASE WHEN epoch_us(l_shipdate)
                              < (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS HUGEINT)
               AS c0,
             CAST(SUM(CASE WHEN epoch_us(l_shipdate)
                              >= (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
                           ELSE 0 END) AS HUGEINT) AS q1,
             CAST(SUM(CASE WHEN epoch_us(l_shipdate)
                              >= (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS HUGEINT)
               AS c1
      FROM lineitem GROUP BY l_partkey),
b AS (SELECT * FROM c WHERE q0 > 0 AND q1 > 0),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(c0) AS HUGEINT) AS sc0,
             CAST(SUM(c1) AS HUGEINT) AS sc1,
             CAST(SUM((c1 * q0) // q1) AS HUGEINT) AS lnum,
             CAST(SUM((c0 * q1) // q0) AS HUGEINT) AS pden
      FROM b),
ix AS (SELECT np,
              floor(CAST(lnum AS DOUBLE) / CAST(sc0 AS DOUBLE)
                    * 1000000 + 0.5005) / 1000000 AS lasp,
              floor(CAST(sc1 AS DOUBLE) / CAST(pden AS DOUBLE)
                    * 1000000 + 0.5005) / 1000000 AS paas
       FROM m)
SELECT np AS n_parts_both, lasp AS laspeyres, paas AS paasche,
       floor(sqrt(lasp * paas) * 1000000 + 0.5005) / 1000000 AS fisher
FROM ix
"""


def t_acf_half_life(sf_dir: str):
    """Autocorrelation half-life of the dense hourly count series:
    the first lag k (≤ 48) where r_k < ½ — and the decision is a PURE
    INTEGER comparison, 2·(n²C_k) < n²C_0, using the same
    mean-clearing identity t_ljung_box ships, so no quantizer can
    flip the selected lag. The memory-horizon number that tells you
    how far back a forecasting feature window must reach. Reports
    the half-life (-1 if autocorrelation never decays below ½ by 48),
    with r₁ and r at the half-life quantized for display."""
    y = _dense_hourly_counts(sf_dir)
    n = len(y)
    S = int(y.sum())
    P0 = int((y.astype(object) * y.astype(object)).sum())
    c0 = n * n * P0 - n * S * S

    def ck(k: int) -> int:
        a, b = y[:-k], y[k:]
        Pk = int((a.astype(object) * b.astype(object)).sum())
        return (n * n * Pk - n * S * (int(a.sum()) + int(b.sum()))
                + (n - k) * S * S)

    c1 = ck(1)
    half = -1
    r_half = 0.0
    for k in range(1, 49):
        v = ck(k) if k != 1 else c1
        if 2 * v < c0:  # r_k < 1/2, exact
            half = k
            r_half = float(_q6(np.float64(float(v))
                               / np.float64(float(c0))))
            break
    return pd.DataFrame({
        "n_hours": [n],
        "r1": [float(_q6(np.float64(float(c1)) / np.float64(float(c0))))],
        "half_life_hours": [half],
        "r_at_half_life": [r_half],
    })


T_ACF_HALF_LIFE_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
y AS MATERIALIZED (SELECT grid.h, COALESCE(c.n, 0) AS n
                   FROM grid LEFT JOIN c USING (h)),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn,
               CAST(SUM(n) AS HUGEINT) AS s,
               CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS p0
        FROM y),
lags AS (SELECT unnest(generate_series(1, 48)) AS k),
pk AS (SELECT lags.k,
              CAST(SUM(CAST(a.n AS HUGEINT) * bb.n) AS HUGEINT) AS p,
              CAST(SUM(a.n) AS HUGEINT) AS sh,
              CAST(SUM(bb.n) AS HUGEINT) AS st
       FROM lags JOIN y a ON TRUE JOIN y bb ON bb.h = a.h + lags.k
       GROUP BY lags.k),
cks AS (SELECT pk.k,
               tot.nn * tot.nn * pk.p
                 - tot.nn * tot.s * (pk.sh + pk.st)
                 + (tot.nn - pk.k) * tot.s * tot.s AS ck,
               tot.nn * tot.nn * tot.p0 - tot.nn * tot.s * tot.s AS c0
        FROM pk CROSS JOIN tot),
hl AS (SELECT k, ck, c0 FROM cks WHERE 2 * ck < c0 ORDER BY k LIMIT 1)
SELECT CAST(tot.nn AS BIGINT) AS n_hours,
       floor(CAST(c1.ck AS DOUBLE) / CAST(c1.c0 AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS r1,
       COALESCE((SELECT k FROM hl), -1) AS half_life_hours,
       COALESCE((SELECT floor(CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE)
                              * 1000000 + 0.5005) / 1000000 FROM hl),
                0.0) AS r_at_half_life
FROM tot CROSS JOIN (SELECT ck, c0 FROM cks WHERE k = 1) c1
"""


def t_seasonal_mk(sf_dir: str):
    """Seasonal Mann–Kendall trend test (Hirsch–Slack): the MK S
    statistic summed over 24 hour-of-day seasons of the daily value
    series — immune to the daily cycle that inflates the plain MK
    test (t_mann_kendall). Every within-season S is a pure integer
    sign-pair count over the dense zero-filled (day, hour) grid, the
    variance numerator 18·V = Σ[n(n−1)(2n+5) − Σt(t−1)(2t+5)] folds
    exactly with tie corrections, and the continuity-corrected
    z = (S∓1)/√(num/18) is built from identical doubles, quantized
    once."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "h": us // 3_600_000_000,
            "c": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    h0, h1 = int(g["h"].min()), int(g["h"].max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[g["h"].to_numpy(np.int64) - h0] = g["c"].to_numpy(np.int64)
    hours = np.arange(h0, h1 + 1, dtype=np.int64)
    hod = hours % 24
    s_total = 0
    var18 = 0
    for h in range(24):
        x = grid[hod == h]  # day-ordered within the season
        nh = len(x)
        if nh < 2:
            continue
        diff = np.sign(x[None, :] - x[:, None])
        s_total += int(np.triu(diff, 1).sum())
        var18 += nh * (nh - 1) * (2 * nh + 5)
        _v, t = np.unique(x, return_counts=True)
        var18 -= sum(int(c) * (int(c) - 1) * (2 * int(c) + 5) for c in t)
    if var18 == 0:
        z = 0.0
    else:
        delta = 1 if s_total > 0 else (-1 if s_total < 0 else 0)
        z = float(_q6(np.float64(s_total - delta)
                      / np.sqrt(np.float64(float(var18)) / 18.0)))
    return pd.DataFrame({
        "s_stat": [s_total], "var18": [var18], "z": [z],
    })


T_SEASONAL_MK_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) // 3600000000 AS lo,
                  MAX(epoch_us(ts)) // 3600000000 AS hi FROM events),
grid AS (SELECT unnest(generate_series(b.lo, b.hi)) AS h FROM b),
c AS (SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS v
      FROM events GROUP BY 1),
y AS MATERIALIZED (SELECT grid.h, grid.h % 24 AS hod,
                          COALESCE(c.v, 0) AS v
                   FROM grid LEFT JOIN c USING (h)),
s AS (SELECT CAST(SUM(CASE WHEN bb.v > a.v THEN 1
                           WHEN bb.v < a.v THEN -1 ELSE 0 END)
                  AS HUGEINT) AS st
      FROM y a JOIN y bb ON a.hod = bb.hod AND a.h < bb.h),
sz AS (SELECT hod, CAST(COUNT(*) AS HUGEINT) AS n FROM y GROUP BY hod),
vn AS (SELECT CAST(SUM(n * (n - 1) * (2 * n + 5)) AS HUGEINT) AS v
       FROM sz WHERE n >= 2),
tie AS (SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                    AS HUGEINT) AS v
        FROM (SELECT hod, v, CAST(COUNT(*) AS HUGEINT) AS t
              FROM y GROUP BY hod, v)
        WHERE hod IN (SELECT hod FROM sz WHERE n >= 2)),
m AS (SELECT s.st, vn.v - tie.v AS var18
      FROM s CROSS JOIN vn CROSS JOIN tie)
SELECT CAST(st AS BIGINT) AS s_stat, CAST(var18 AS BIGINT) AS var18,
       CASE WHEN var18 = 0 THEN 0.0
            ELSE floor(CAST(st - CASE WHEN st > 0 THEN 1
                                      WHEN st < 0 THEN -1
                                      ELSE 0 END AS DOUBLE)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                       * 1000000 + 0.5005) / 1000000 END AS z
FROM m
"""


def d_embed_adjacent_sim(sf_dir: str):
    """Cosine-similarity profile of consecutive embedding pairs
    (vec_id, vec_id+1) — the quick anisotropy/duplication smoke test
    before any ANN build: a healthy random corpus centers near 0, a
    collapsed or near-dup-riddled one drifts high. Each cosine is
    ROW-LOCAL and floor-quantized at 1e-6 (the d_knn discipline, so
    BLAS-vs-sequential dot drift cannot move a value), after which
    the mean folds exactly over quantized micro-ints and p10/p50/p90
    are exact rank-⌈q·n⌉ elements. Pairing ships each vector to its
    two pair groups (2× exchange) through one grouped_map — no
    global sort."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
               split=True)
    mx = int(_read(sf_dir, "embeddings", columns=["vec_id"])
             .max("vec_id"))

    def fan(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        keep_left = ids < mx          # left member of pair id
        keep_right = ids > 0          # right member of pair id-1
        pair = np.concatenate([ids[keep_left], ids[keep_right] - 1])
        role = np.concatenate([np.zeros(int(keep_left.sum()), np.int64),
                               np.ones(int(keep_right.sum()), np.int64)])
        emb = batch["embedding"]
        idx = np.concatenate([np.flatnonzero(keep_left),
                              np.flatnonzero(keep_right)])
        return pa.table({
            "pair": pa.array(pair, pa.int64()),
            "role": pa.array(role, pa.int64()),
            "embedding": emb.take(pa.array(idx, pa.int64())),
        })

    def sim(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["pair", "role"])
        m = np.vstack(g["embedding"].to_numpy()).astype(np.float64)
        pair = g["pair"].to_numpy(np.int64)
        # complete pairs appear as consecutive (role 0, role 1) rows
        ok = (pair[:-1] == pair[1:]) \
            & (g["role"].to_numpy(np.int64)[:-1] == 0)
        i = np.flatnonzero(ok)
        a, b = m[i], m[i + 1]
        dot = (a * b).sum(axis=1)
        na = np.sqrt((a * a).sum(axis=1))
        nb = np.sqrt((b * b).sum(axis=1))
        c = dot / (na * nb)
        q = np.floor(c * 1e6 + 0.5005).astype(np.int64)
        out = pd.DataFrame({"q": q, "n": 1})
        return pa.Table.from_pandas(
            out.groupby("q", as_index=False).sum(), preserve_index=False)

    g = (
        grouped_map(ds.map_batches(fan, batch_format="pyarrow"), "pair",
                    sim)
        .to_pandas()
        .groupby("q", as_index=False)["n"].sum()
        .sort_values("q")
    )
    vals = g["q"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)

    def at(qq: int) -> float:
        r = (qq * n + 9) // 10 if qq < 10 else n
        return float(vals[np.searchsorted(cum, max(r, 1), "left")]) / 1e6

    tot = _exact_dot(vals, cnt)
    return pd.DataFrame({
        "n_pairs": [n],
        "mean_sim": [float(_q6(np.float64(float(tot)) / 1e6
                               / np.float64(n)))],
        "p10": [at(1)], "p50": [at(5)], "p90": [at(9)],
    })


D_EMBED_ADJACENT_SIM_SQL = """
WITH s AS (SELECT a.vec_id,
                  CAST(floor(list_cosine_similarity(
                         CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[]))
                       * 1000000 + 0.5005) AS BIGINT) AS q
           FROM embeddings a JOIN embeddings b
             ON b.vec_id = a.vec_id + 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS HUGEINT) AS s FROM s),
rk AS (SELECT q, ROW_NUMBER() OVER (ORDER BY q) AS i FROM s)
SELECT t.n AS n_pairs,
       floor(CAST(t.s AS DOUBLE) / 1000000 / CAST(t.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_sim,
       (SELECT q FROM rk WHERE i = greatest((1 * t.n + 9) // 10, 1))
         / 1000000.0 AS p10,
       (SELECT q FROM rk WHERE i = greatest((5 * t.n + 9) // 10, 1))
         / 1000000.0 AS p50,
       (SELECT q FROM rk WHERE i = greatest((9 * t.n + 9) // 10, 1))
         / 1000000.0 AS p90
FROM t
"""


def q_dup_orders(sf_dir: str):
    """Duplicate-invoice audit: orders sharing (customer, exact total
    cents) — the double-billing / double-ingestion signal an
    order-key uniqueness check (q_key_audit) cannot see because the
    keys differ. Per-batch (custkey, cents) count partials fold
    driver-side (near-unique key — the multi-column Ray groupby
    trap); every output is an exact integer plus one quantized
    dup-row share."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": batch["o_custkey"].to_numpy(),
            "c": np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["u", "c"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["u", "c"], as_index=False)["n"].sum()
    )
    n = int(g["n"].sum())
    dup = g[g["n"] >= 2]
    return pd.DataFrame({
        "n_orders": [n],
        "dup_groups": [len(dup)],
        "dup_rows": [int(dup["n"].sum())],
        "max_group": [int(g["n"].max())],
        "dup_share": [float(_q6(np.float64(int(dup["n"].sum()))
                                / np.float64(n)))],
    })


Q_DUP_ORDERS_SQL = """
WITH g AS (SELECT o_custkey,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1, 2),
m AS (SELECT CAST(SUM(n) AS BIGINT) AS n_orders,
             CAST(COUNT(*) FILTER (n >= 2) AS BIGINT) AS dup_groups,
             CAST(COALESCE(SUM(n) FILTER (n >= 2), 0) AS BIGINT)
               AS dup_rows,
             CAST(MAX(n) AS BIGINT) AS max_group
      FROM g)
SELECT n_orders, dup_groups, dup_rows, max_group,
       floor(CAST(dup_rows AS DOUBLE) / CAST(n_orders AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS dup_share
FROM m
"""


def t_event_trigrams(sf_dir: str):
    """Top-10 event-type trigrams across per-user (ts, event_id)-
    ordered streams — the behavioral-motif miner above
    q_entropy_rate's pairwise transitions (view→click→purchase vs
    view→view→view tell different product stories). Trigram counts
    are exact integers from vectorized double-shift extraction inside
    one entity shuffle; the top-10 selects by (count desc, trigram
    asc) so ties are deterministic in both engines."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"],
               split=True)

    def tri(g: pd.DataFrame) -> pa.Table:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "t": us,
            "e": g["event_id"].to_numpy(np.int64),
            "et": g["event_type"].to_numpy(object),
        }).sort_values(["u", "t", "e"], kind="stable")
        u = df["u"].to_numpy()
        et = df["et"].to_numpy(object)
        same = (u[2:] == u[:-2])
        a, b, c = et[:-2][same], et[1:-1][same], et[2:][same]
        out = pd.DataFrame({
            "tri": pd.Series(a).str.cat([pd.Series(b), pd.Series(c)],
                                        sep=">"),
            "n": 1,
        })
        return pa.Table.from_pandas(
            out.groupby("tri", as_index=False).sum(), preserve_index=False)

    g = (
        grouped_map(ds, "user_id", tri)
        .to_pandas()
        .groupby("tri", as_index=False)["n"].sum()
    )
    g = g.sort_values(["n", "tri"], ascending=[False, True],
                      kind="stable").head(10)
    return g.rename(columns={"tri": "trigram"}).reset_index(drop=True)


T_EVENT_TRIGRAMS_SQL = """
WITH s AS (SELECT user_id, event_type AS a,
                  LEAD(event_type, 1) OVER w AS b,
                  LEAD(event_type, 2) OVER w AS c
           FROM events
           WINDOW w AS (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id)),
t AS (SELECT a || '>' || b || '>' || c AS trigram,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE b IS NOT NULL AND c IS NOT NULL
      GROUP BY 1)
SELECT trigram, n FROM t ORDER BY n DESC, trigram LIMIT 10
"""


def t_burstiness(sf_dir: str):
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of inter-arrival
    times per event type: −1 is a metronome, 0 a Poisson process,
    →1 heavy bursts — the single number that says whether t_fano's
    over-dispersion comes from clumped arrivals. Inter-arrival µs
    diffs are exact integers from each type's (ts, event_id)-ordered
    stream (one type-keyed shuffle; types are few so each group sorts
    locally); the three moments fold exactly and B quantizes once
    per type."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "event_id"],
               split=True)

    def gaps(g: pd.DataFrame) -> pa.Table:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "et": g["event_type"].to_numpy(object), "t": us,
            "e": g["event_id"].to_numpy(np.int64),
        }).sort_values(["et", "t", "e"], kind="stable")
        et = df["et"].to_numpy(object)
        t = df["t"].to_numpy(np.int64)
        same = et[1:] == et[:-1]
        d = (t[1:] - t[:-1])[same]
        out = pd.DataFrame({
            "et": et[1:][same], "n": 1, "s": d,
            "ss": d.astype(object) * d.astype(object),
        })
        agg = out.groupby("et", as_index=False).sum()
        # Σd² exceeds both int64 and float64's exact range (gap² alone
        # can pass 2^53): ship it split into two exact int64 limbs
        ss = agg.pop("ss")
        agg["ss_hi"] = [int(v) >> 62 for v in ss]
        agg["ss_lo"] = [int(v) & ((1 << 62) - 1) for v in ss]
        return pa.Table.from_pandas(agg, preserve_index=False)

    # each event type lives entirely in one grouped_map bucket, so the
    # per-bucket partials ARE the per-type exact totals
    g = grouped_map(ds, "event_type", gaps).to_pandas()
    rows = []
    for _, r in g.sort_values("et").iterrows():
        n, s = int(r["n"]), int(r["s"])
        ss = (int(r["ss_hi"]) << 62) + int(r["ss_lo"])
        if n < 2:
            continue
        mu = np.float64(s) / np.float64(n)
        var = np.float64(n * ss - s * s) / (np.float64(n) * np.float64(n))
        sig = np.sqrt(var)
        b = float(_q6((sig - mu) / (sig + mu)))
        rows.append((r["et"], n, float(_q6(mu / 1e6)), b))
    return pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                       "mean_gap_sec", "burstiness"])


T_BURSTINESS_SQL = """
WITH s AS (SELECT event_type,
                  epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY event_type
                     ORDER BY epoch_us(ts), event_id) AS d
           FROM events),
g AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(d AS HUGEINT)) AS HUGEINT) AS sd,
             CAST(SUM(CAST(d AS HUGEINT) * d) AS HUGEINT) AS ss
      FROM s WHERE d IS NOT NULL GROUP BY event_type
      HAVING COUNT(*) >= 2),
f AS (SELECT event_type, n,
             CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             sqrt(CAST(n * ss - sd * sd AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sig
      FROM g)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       floor(mu / 1000000 * 1000000 + 0.5005) / 1000000 AS mean_gap_sec,
       floor((sig - mu) / (sig + mu) * 1000000 + 0.5005) / 1000000
         AS burstiness
FROM f ORDER BY event_type
"""


def t_stickiness(sf_dir: str):
    """DAU/WAU stickiness per calendar week: mean daily active users
    over the week's 7 day slots divided by the week's distinct
    actives — the habit-strength ratio (1/7 = everyone shows up once,
    1.0 = everyone every day) that t_growth_accounting's flows don't
    expose. Distinct (user, day) presence reduces per batch; the
    fold is O(user-days); DAU sums and WAU counts are exact integers
    and each week's ratio quantizes once."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "u": batch["user_id"].to_numpy(),
            "d": us // 86_400_000_000,
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    g["w"] = g["d"] // 7
    dau_sum = g.groupby("w").size()                      # Σ daily actives
    wau = g.drop_duplicates(["u", "w"]).groupby("w").size()
    rows = []
    for w in sorted(wau.index):
        ds_ = int(dau_sum[w])
        wa = int(wau[w])
        rows.append((int(w), ds_, wa, float(_q6(
            np.float64(ds_) / 7.0 / np.float64(wa)))))
    return pd.DataFrame(rows, columns=["week", "user_days", "wau",
                                       "stickiness"])


T_STICKINESS_SQL = """
WITH ud AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d
            FROM events),
w AS (SELECT user_id, d, d // 7 AS wk FROM ud),
m AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS user_days,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM w GROUP BY wk)
SELECT wk AS week, user_days, wau,
       floor(CAST(user_days AS DOUBLE) / 7.0 / CAST(wau AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS stickiness
FROM m ORDER BY wk
"""


def d_sentence_dedup(sf_dir: str):
    """Sentence-level boilerplate audit: split every document on '.',
    trim, keep sentences of ≥ 3 words, and measure how much of the
    corpus' sentence mass is REPEATED text (occurrences beyond each
    sentence's first) plus the single most-repeated sentence — the
    grain between d_exact_dedup's whole-document hash and
    d_dup_passages' n-gram windows, where legal footers and cookie
    banners actually live. Per-batch sentence-count partials bound
    the exchange to distinct sentences; all counts exact; one
    quantized share."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text"])

    def cells(batch: pa.Table) -> pa.Table:
        s = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
             .fillna("").str.split(".").explode().str.strip(" "))
        s = s[s.str.count(r"\S+") >= 3]
        df = pd.DataFrame({"sent": s.to_numpy(), "n": 1})
        return pa.Table.from_pandas(
            df.groupby("sent", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("sent").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = g["n"].to_numpy(np.int64)
    total = int(n.sum())
    rep = int((n - 1).sum())  # occurrences beyond each first
    top = g.sort_values(["n", "sent"], ascending=[False, True],
                        kind="stable").iloc[0]
    return pd.DataFrame({
        "n_sentences": [total],
        "n_distinct": [len(g)],
        "repeated_occurrences": [rep],
        "top_count": [int(top["n"])],
        "repeat_share": [float(_q6(np.float64(rep) / np.float64(total)))],
    })


D_SENTENCE_DEDUP_SQL = """
WITH s AS (SELECT trim(unnest(string_split(coalesce(text, ''), '.')))
             AS sent
           FROM documents),
k AS (SELECT sent FROM s
      WHERE array_length(regexp_extract_all(sent, '\\S+')) >= 3),
c AS (SELECT sent, CAST(COUNT(*) AS BIGINT) AS n FROM k GROUP BY sent),
m AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(n - 1) AS BIGINT) AS rep FROM c),
t AS (SELECT n FROM c ORDER BY n DESC, sent LIMIT 1)
SELECT m.total AS n_sentences, m.nd AS n_distinct,
       m.rep AS repeated_occurrences,
       (SELECT n FROM t) AS top_count,
       floor(CAST(m.rep AS DOUBLE) / CAST(m.total AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS repeat_share
FROM m
"""


def q_supply_concentration(sf_dir: str):
    """Supply-chain concentration audit: per part, the supplier-share
    HHI of shipped quantity plus the single/dual/multi-sourced part
    census — the procurement-risk table a plain supplier count
    misses (two suppliers at 99/1 is still single-sourced risk). Each
    part's HHI Σq_s²/(Σq_s)² is a rational of exact integer quantity
    sums, floored to 1e-9 micro-units before the order-immune fold;
    per-batch (part, supplier, qty) partials fold driver-side (the
    near-unique two-key exchange; at 100 TB the fold goes back
    through a part-keyed exchange)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p": batch["l_partkey"].to_numpy(),
            "s": batch["l_suppkey"].to_numpy(),
            "q": np.floor(batch["l_quantity"].to_numpy() + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby(["p", "s"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["p", "s"], as_index=False)["q"].sum()
    )
    per = g.groupby("p").agg(ns=("s", "size"), tq=("q", "sum"))
    sq = g.assign(q2=g["q"].astype(object) * g["q"].astype(object)) \
        .groupby("p")["q2"].sum()
    n_parts = len(per)
    single = int((per["ns"] == 1).sum())
    dual = int((per["ns"] == 2).sum())
    multi = n_parts - single - dual
    fold = 0
    for p, row in per.iterrows():
        tq = int(row["tq"])
        hhi = np.float64(float(int(sq[p]))) \
            / (np.float64(tq) * np.float64(tq))
        fold += int(np.floor(hhi * 1e9 + 0.5005))
    return pd.DataFrame({
        "n_parts": [n_parts], "single_sourced": [single],
        "dual_sourced": [dual], "multi_sourced": [multi],
        "mean_hhi": [float(_q6(np.float64(fold) / 1e9
                               / np.float64(n_parts)))],
    })


Q_SUPPLY_CONCENTRATION_SQL = """
WITH c AS (SELECT l_partkey AS p, l_suppkey AS s,
                  CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT))
                       AS HUGEINT) AS q
           FROM lineitem GROUP BY 1, 2),
per AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS ns,
               CAST(SUM(q) AS HUGEINT) AS tq,
               CAST(SUM(q * q) AS HUGEINT) AS sq
        FROM c GROUP BY p),
f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(COUNT(*) FILTER (ns = 1) AS BIGINT) AS single_sourced,
             CAST(COUNT(*) FILTER (ns = 2) AS BIGINT) AS dual_sourced,
             CAST(SUM(CAST(floor(CAST(sq AS DOUBLE)
                                 / (CAST(tq AS DOUBLE)
                                    * CAST(tq AS DOUBLE))
                                 * 1000000000 + 0.5005) AS BIGINT))
                  AS HUGEINT) AS fold
      FROM per)
SELECT n_parts, single_sourced, dual_sourced,
       n_parts - single_sourced - dual_sourced AS multi_sourced,
       floor(CAST(fold AS DOUBLE) / 1000000000 / CAST(n_parts AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_hhi
FROM f
"""


def t_conversion_lag(sf_dir: str):
    """Signup→purchase conversion-lag distribution for CONVERTED
    users: median and p90 lag (hours) are exact rank-⌈q·n⌉ elements
    of the duration multiset the survival family (_surv_labels)
    already builds — censored users never enter, so this is the
    answer to "how long until the median converter converts", not
    KM's hazard view. Durations floor to whole hours (exact integer
    µs ⫽ 3.6e9); only the mean quantizes."""
    u = _surv_labels(sf_dir)
    dur = np.sort(u.loc[u["ev"], "dur"].to_numpy(np.int64)
                  // 3_600_000_000)
    n = len(dur)
    med = int(dur[(n + 1) // 2 - 1])
    p90 = int(dur[(9 * n + 9) // 10 - 1])
    tot = _exact_sum(dur)
    return pd.DataFrame({
        "n_converted": [n], "median_lag_hours": [med],
        "p90_lag_hours": [p90],
        "mean_lag_hours": [float(_q6(np.float64(float(tot))
                                     / np.float64(n)))],
    })


T_CONVERSION_LAG_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT s.user_id, MIN(epoch_us(e.ts)) AS t1
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.t0
      GROUP BY s.user_id),
d AS (SELECT (p.t1 - s.t0) // 3600000000 AS lag
      FROM p JOIN s USING (user_id)),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(lag AS HUGEINT)) AS HUGEINT) AS tot FROM d),
rk AS (SELECT lag, ROW_NUMBER() OVER (ORDER BY lag) AS i FROM d)
SELECT t.n AS n_converted,
       (SELECT lag FROM rk WHERE i = (t.n + 1) // 2)
         AS median_lag_hours,
       (SELECT lag FROM rk WHERE i = (9 * t.n + 9) // 10)
         AS p90_lag_hours,
       floor(CAST(t.tot AS DOUBLE) / CAST(t.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_lag_hours
FROM t
"""


def q_basket_diversity(sf_dir: str):
    """Basket brand diversity: distinct part brands per order, as a
    histogram plus the quantized mean — the assortment-breadth
    number behind cross-sell health (one-brand baskets vs explorers).
    The part→brand dimension broadcasts ONCE via ray.put (the
    broadcast-attach pattern — parts are a dimension, never
    shuffled); per-batch distinct (order, brand) partials dedup
    before one order-keyed exchange, and the histogram is an exact
    integer fold."""
    import ray as _ray

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]) \
        .to_pandas()
    bmap_ref = _ray.put(dict(zip(part["p_partkey"].to_numpy(np.int64),
                                 part["p_brand"].to_numpy(object))))

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    class Attach:
        def __init__(self, ref=bmap_ref):
            self.bmap = _ray.get(ref) if isinstance(
                ref, _ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "o": batch["l_orderkey"].to_numpy(),
                "b": pd.Series(batch["l_partkey"].to_numpy())
                    .map(self.bmap).to_numpy(object),
            }).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

    g = (
        # fractional num_cpus: the pool must never absorb every core of
        # a small session (read tasks starve and the pipeline deadlocks)
        ds.map_batches(Attach, batch_format="pyarrow", concurrency=2,
                       num_cpus=0.5)
        .to_pandas()
        .drop_duplicates()
        .groupby("o").size()
    )
    hist = g.value_counts().sort_index()
    n_orders = len(g)
    tot = int(g.sum())
    rows = [(int(k), int(v)) for k, v in hist.items()]
    out = pd.DataFrame(rows, columns=["n_brands", "n_orders"])
    out["mean_brands"] = float(_q6(np.float64(tot)
                                   / np.float64(n_orders)))
    return out


Q_BASKET_DIVERSITY_SQL = """
WITH d AS (SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
k AS (SELECT o, CAST(COUNT(*) AS BIGINT) AS nb FROM d GROUP BY o),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(nb) AS HUGEINT) AS tot FROM k)
SELECT k.nb AS n_brands, CAST(COUNT(*) AS BIGINT) AS n_orders,
       floor(CAST(t.tot AS DOUBLE) / CAST(t.n_orders AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_brands
FROM k CROSS JOIN t
GROUP BY k.nb, t.tot, t.n_orders ORDER BY k.nb
"""


def q_ship_delay(sf_dir: str):
    """Order-to-ship delay distribution: days between o_orderdate and
    each line's l_shipdate, through the orderkey-keyed FACT×FACT
    shuffle join (auto_join picks the hash path — the order side is
    corpus-scale, never broadcast). Median and p90 delay are exact
    rank-⌈q·n⌉ elements of the day-gap multiset via an O(distinct
    gaps) value-cell fold; only the mean quantizes. Negative delays
    (data bugs) are counted, not dropped."""
    from ..stages.partition import auto_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    j = auto_join(li, od, left_on="l_orderkey", right_on="o_orderkey")

    def cells(batch: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(batch["l_shipdate"], pa.timestamp("us")),
                    pa.int64()).to_numpy() // 86_400_000_000
        o = pc.cast(pc.cast(batch["o_orderdate"], pa.timestamp("us")),
                    pa.int64()).to_numpy() // 86_400_000_000
        df = pd.DataFrame({"gap": s - o, "n": 1})
        return pa.Table.from_pandas(
            df.groupby("gap", as_index=False).sum(), preserve_index=False)

    g = (
        j.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("gap", as_index=False)["n"].sum()
        .sort_values("gap")
    )
    vals = g["gap"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)
    med = int(vals[np.searchsorted(cum, (n + 1) // 2, "left")])
    p90 = int(vals[np.searchsorted(cum, (9 * n + 9) // 10, "left")])
    tot = _exact_dot(vals, cnt)
    neg = int(cnt[vals < 0].sum())
    return pd.DataFrame({
        "n_lines": [n], "negative_delays": [neg],
        "median_delay_days": [med], "p90_delay_days": [p90],
        "mean_delay_days": [float(_q6(np.float64(float(tot))
                                      / np.float64(n)))],
    })


Q_SHIP_DELAY_SQL = """
WITH d AS (SELECT epoch_us(l.l_shipdate) // 86400000000
                    - epoch_us(o.o_orderdate) // 86400000000 AS gap
           FROM lineitem l JOIN orders o
             ON o.o_orderkey = l.l_orderkey),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(gap AS HUGEINT)) AS HUGEINT) AS tot,
             CAST(COUNT(*) FILTER (gap < 0) AS BIGINT) AS neg FROM d),
rk AS (SELECT gap, ROW_NUMBER() OVER (ORDER BY gap) AS i FROM d)
SELECT t.n AS n_lines, t.neg AS negative_delays,
       (SELECT gap FROM rk WHERE i = (t.n + 1) // 2)
         AS median_delay_days,
       (SELECT gap FROM rk WHERE i = (9 * t.n + 9) // 10)
         AS p90_delay_days,
       floor(CAST(t.tot AS DOUBLE) / CAST(t.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_delay_days
FROM t
"""


def t_error_recovery(sf_dir: str):
    """Error-recovery time: for every 'error' event, the gap to the
    user's NEXT event in (ts, event_id) stream order — the UX-health
    number ("after something breaks, how fast do users act again?")
    with unrecovered errors (stream ends) counted separately. Gaps
    are exact integer µs from one entity shuffle; median/p90 recovery
    seconds are exact element selections over the whole-second gap
    multiset; only the mean quantizes."""
    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"],
               split=True)

    def rec(g: pd.DataFrame) -> pa.Table:
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "t": us,
            "e": g["event_id"].to_numpy(np.int64),
            "et": g["event_type"].to_numpy(object),
        }).sort_values(["u", "t", "e"], kind="stable")
        u = df["u"].to_numpy()
        t = df["t"].to_numpy()
        iserr = df["et"].to_numpy(object) == "error"
        same = np.concatenate([u[1:] == u[:-1], [False]])
        has_next = iserr & same
        gap_sec = (np.concatenate([t[1:], [0]]) - t)[has_next] \
            // 1_000_000
        unrec = int((iserr & ~same).sum())
        out = pd.DataFrame({"gap": gap_sec, "n": 1})
        out = out.groupby("gap", as_index=False).sum()
        out["unrec"] = 0
        marker = pd.DataFrame({"gap": [-1], "n": [0], "unrec": [unrec]})
        return pa.Table.from_pandas(
            pd.concat([out, marker], ignore_index=True),
            preserve_index=False)

    g = (
        grouped_map(ds, "user_id", rec)
        .to_pandas()
        .groupby("gap", as_index=False)[["n", "unrec"]].sum()
    )
    unrec = int(g["unrec"].sum())
    g = g[g["gap"] >= 0].sort_values("gap")
    vals = g["gap"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)
    med = int(vals[np.searchsorted(cum, (n + 1) // 2, "left")])
    p90 = int(vals[np.searchsorted(cum, (9 * n + 9) // 10, "left")])
    tot = _exact_dot(vals, cnt)
    return pd.DataFrame({
        "n_recovered": [n], "n_unrecovered": [unrec],
        "median_recovery_sec": [med], "p90_recovery_sec": [p90],
        "mean_recovery_sec": [float(_q6(np.float64(float(tot))
                                        / np.float64(n)))],
    })


T_ERROR_RECOVERY_SQL = """
WITH s AS (SELECT event_type,
                  LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS nxt,
                  epoch_us(ts) AS t
           FROM events),
e AS (SELECT (nxt - t) // 1000000 AS gap, nxt IS NULL AS unrec
      FROM s WHERE event_type = 'error'),
r AS (SELECT gap FROM e WHERE NOT unrec),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(gap AS HUGEINT)) AS HUGEINT) AS tot FROM r),
u AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM e WHERE unrec),
rk AS (SELECT gap, ROW_NUMBER() OVER (ORDER BY gap) AS i FROM r)
SELECT t.n AS n_recovered, u.k AS n_unrecovered,
       (SELECT gap FROM rk WHERE i = (t.n + 1) // 2)
         AS median_recovery_sec,
       (SELECT gap FROM rk WHERE i = (9 * t.n + 9) // 10)
         AS p90_recovery_sec,
       floor(CAST(t.tot AS DOUBLE) / CAST(t.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_recovery_sec
FROM t CROSS JOIN u
"""


def d_casing_profile(sf_dir: str):
    """Token-casing profile per source: shares of lowercase,
    TitleCase, ALLCAPS, numeric and other tokens — the WORD-level
    register/shouting audit complementing d_charclass's char grain
    (a source drifting toward ALLCAPS is ads or OCR, TitleCase-heavy
    is headlines). One vectorized regex pass per batch; counts fold
    as exact integers through a tiny per-source exchange; shares
    quantize once each."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        tok = ex.astype(str)
        lower = tok.str.fullmatch(r"[a-z]+").to_numpy()
        title = tok.str.fullmatch(r"[A-Z][a-z]+").to_numpy()
        caps = tok.str.fullmatch(r"[A-Z]{2,}").to_numpy()
        num = tok.str.fullmatch(r"[0-9]+").to_numpy()
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "n": 1,
            "lo": lower.astype(np.int64), "ti": title.astype(np.int64),
            "ca": caps.astype(np.int64), "nu": num.astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("lo", alias_name="lo"),
                   Sum("ti", alias_name="ti"), Sum("ca", alias_name="ca"),
                   Sum("nu", alias_name="nu"))
        .to_pandas().sort_values("source")
    )
    rows = []
    for _, r in g.iterrows():
        n = int(r["n"])
        sh = [float(_q6(np.float64(int(r[c])) / np.float64(n)))
              for c in ["lo", "ti", "ca", "nu"]]
        other = n - int(r["lo"]) - int(r["ti"]) - int(r["ca"]) \
            - int(r["nu"])
        rows.append((r["source"], n, *sh,
                     float(_q6(np.float64(other) / np.float64(n)))))
    return pd.DataFrame(rows, columns=[
        "source", "n_tokens", "lower_share", "title_share",
        "caps_share", "numeric_share", "other_share"])


D_CASING_PROFILE_SQL = """
WITH u AS (SELECT source,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (regexp_matches(tok, '^[a-z]+$'))
                  AS BIGINT) AS lo,
             CAST(COUNT(*) FILTER (regexp_matches(tok, '^[A-Z][a-z]+$'))
                  AS BIGINT) AS ti,
             CAST(COUNT(*) FILTER (regexp_matches(tok, '^[A-Z]{2,}$'))
                  AS BIGINT) AS ca,
             CAST(COUNT(*) FILTER (regexp_matches(tok, '^[0-9]+$'))
                  AS BIGINT) AS nu
      FROM u GROUP BY source)
SELECT source, n AS n_tokens,
       floor(CAST(lo AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS lower_share,
       floor(CAST(ti AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS title_share,
       floor(CAST(ca AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS caps_share,
       floor(CAST(nu AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS numeric_share,
       floor(CAST(n - lo - ti - ca - nu AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS other_share
FROM c ORDER BY source
"""


def t_activity_heatmap(sf_dir: str):
    """Day-of-week × hour-of-day activity heatmap with a chi-square
    uniformity test — the on-call staffing grid (t_seasonality sees
    hours only; weekday structure hides from it). Cell counts are
    exact integers over the 7×24 grid (epoch day 0 = Thursday, so
    dow = (day+4) % 7 gives 0 = Sunday in both engines); expected
    counts under uniformity are the rational N/168, each chi² term
    micro-floors at 1e-6, and the statistic quantizes once. Output is
    the 168-cell grid plus per-cell share."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        day = us // 86_400_000_000
        df = pd.DataFrame({
            "dow": (day + 4) % 7,
            "hod": (us // 3_600_000_000) % 24,
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["dow", "hod"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["dow", "hod"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    full = pd.MultiIndex.from_product([range(7), range(24)],
                                      names=["dow", "hod"]).to_frame(
        index=False)
    g = full.merge(g, on=["dow", "hod"], how="left").fillna(0)
    g["n"] = g["n"].astype(np.int64)
    n = int(g["n"].sum())
    e = np.float64(n) / 168.0
    t = (g["n"].to_numpy(np.float64) - e) ** 2 / e
    chi2 = np.float64(
        int(np.floor(t * 1e6 + 0.5005).astype(np.int64).sum())) / 1e6
    g["share"] = _q6(g["n"].to_numpy(np.float64) / np.float64(n))
    g["chi2_uniform"] = float(_q6(chi2))
    return g.sort_values(["dow", "hod"]).reset_index(drop=True)


T_ACTIVITY_HEATMAP_SQL = """
WITH e AS (SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
                  (epoch_us(ts) // 3600000000) % 24 AS hod
           FROM events),
grid AS (SELECT d.dow, h.hod
         FROM (SELECT unnest(generate_series(0, 6)) AS dow) d
         CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hod) h),
c AS (SELECT grid.dow, grid.hod,
             CAST(COALESCE(k.n, 0) AS BIGINT) AS n
      FROM grid LEFT JOIN (SELECT dow, hod,
                                  CAST(COUNT(*) AS BIGINT) AS n
                           FROM e GROUP BY dow, hod) k
        USING (dow, hod)),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
x AS (SELECT CAST(SUM(CAST(floor(
          (CAST(c.n AS DOUBLE) - CAST(t.total AS DOUBLE) / 168.0)
          * (CAST(c.n AS DOUBLE) - CAST(t.total AS DOUBLE) / 168.0)
          / (CAST(t.total AS DOUBLE) / 168.0)
          * 1000000 + 0.5005) AS BIGINT)) AS HUGEINT) AS f
      FROM c CROSS JOIN t)
SELECT c.dow, c.hod, c.n,
       floor(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS share,
       floor(CAST(x.f AS DOUBLE) / 1000000 * 1000000 + 0.5005) / 1000000
         AS chi2_uniform
FROM c CROSS JOIN t CROSS JOIN x
ORDER BY c.dow, c.hod
"""


def d_keyness_g2(sf_dir: str):
    """Dunning log-likelihood (G²) keyness: the top-10 tokens whose
    frequency most significantly differs between the odd- and
    even-doc_id corpus halves — the statistically-grounded version of
    d_distinctive_tokens' raw lift (G² does not over-reward rare
    tokens). Every observed/expected term is built from exact integer
    counts (min 5 occurrences overall), each token's G² quantizes
    once, and the top-10 ranks by (G² desc, token asc) so ties are
    deterministic. One vocabulary-sized exchange."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "h": (ids % 2)[ex.index.to_numpy(np.int64)],
            "tok": ex.to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["h", "tok"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["h", "tok"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = g.pivot_table(index="tok", columns="h", values="n",
                        fill_value=0, aggfunc="sum")
    a = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    b = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(np.int64)
    na, nb = int(a.sum()), int(b.sum())
    keep = (a + b) >= 5
    toks = piv.index.to_numpy(object)[keep]
    a, b = a[keep], b[keep]
    naf, nbf = np.float64(na), np.float64(nb)
    ea = (a + b).astype(np.float64) * naf / (naf + nbf)
    eb = (a + b).astype(np.float64) * nbf / (naf + nbf)
    ta = np.where(a > 0,
                  a * np.log(np.where(a > 0, a, 1).astype(np.float64)
                             / ea), 0.0)
    tb = np.where(b > 0,
                  b * np.log(np.where(b > 0, b, 1).astype(np.float64)
                             / eb), 0.0)
    g2 = _q6(2.0 * (ta + tb))
    df = pd.DataFrame({"token": toks, "n_odd": a, "n_even": b,
                       "g2": g2.astype(np.float64)})
    df = df.sort_values(["g2", "token"], ascending=[False, True],
                        kind="stable").head(10)
    return df.reset_index(drop=True)


D_KEYNESS_G2_SQL = """
WITH u AS (SELECT doc_id % 2 AS h,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT tok,
             CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM u GROUP BY tok HAVING SUM(1) >= 5),
t AS (SELECT CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
      FROM u),
g AS (SELECT c.tok, c.a, c.b,
             floor(2.0 * (
               CASE WHEN c.a > 0 THEN c.a * ln(CAST(c.a AS DOUBLE)
                 / (CAST(c.a + c.b AS DOUBLE) * CAST(t.na AS DOUBLE)
                    / (CAST(t.na AS DOUBLE) + CAST(t.nb AS DOUBLE))))
                 ELSE 0.0 END
               + CASE WHEN c.b > 0 THEN c.b * ln(CAST(c.b AS DOUBLE)
                 / (CAST(c.a + c.b AS DOUBLE) * CAST(t.nb AS DOUBLE)
                    / (CAST(t.na AS DOUBLE) + CAST(t.nb AS DOUBLE))))
                 ELSE 0.0 END) * 1000000 + 0.5005) / 1000000 AS g2
      FROM c CROSS JOIN t)
SELECT tok AS token, a AS n_odd, b AS n_even, g2
FROM g ORDER BY g2 DESC, tok LIMIT 10
"""


def d_mix_budget(sf_dir: str):
    """Temperature-reweighted token-budget ALLOCATION (τ = 0.7; the
    existing d_temperature_mix gives α=0.5 weights only — this turns
    weights into integer seats; the multilingual
    /multi-source data-mixing staple): w_s ∝ p_s^0.7 upweights small
    sources relative to raw proportional sampling, and a 1M-token
    budget is allocated by the same integer largest-remainder
    machinery as q_neyman_alloc — each weight quantizes ONCE to a
    nano-weight, after which seats are pure integer arithmetic. Token
    counts are exact from one source-cell exchange; the pow(·, 0.7)
    evaluates on identical doubles in both engines."""
    from ray.data.aggregate import Sum

    B = 1_000_000
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        cnt = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
               .fillna("").str.count(r"\S+").to_numpy(np.int64))
        df = pd.DataFrame({"source": src.to_numpy(), "n": cnt})
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values("source")
    )
    tot = int(g["n"].sum())
    xq = [int(np.floor(np.power(np.float64(int(n)) / np.float64(tot),
                                0.7) * 1e9 + 0.5005))
          for n in g["n"]]
    sq = sum(xq)
    base = [(B * x) // sq for x in xq]
    rem = [(B * x) % sq for x in xq]
    left = B - sum(base)
    srcs = g["source"].tolist()
    order = sorted(range(len(srcs)), key=lambda i: (-rem[i], srcs[i]))
    alloc = list(base)
    for i in order[:left]:
        alloc[i] += 1
    return pd.DataFrame({
        "source": srcs,
        "n_tokens": [int(v) for v in g["n"]],
        "weight_nano": xq,
        "token_budget": alloc,
    })


D_MIX_BUDGET_SQL = """
WITH c AS (SELECT source,
                  CAST(SUM(array_length(regexp_extract_all(
                        coalesce(text, ''), '\\S+'))) AS BIGINT) AS n
           FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c),
x AS (SELECT c.source, c.n,
             CAST(floor(pow(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE),
                            0.7) * 1000000000 + 0.5005) AS HUGEINT)
               AS xq
      FROM c CROSS JOIN t),
s AS (SELECT CAST(SUM(xq) AS HUGEINT) AS sq FROM x),
b AS (SELECT x.source, x.n, x.xq,
             (1000000 * x.xq) // s.sq AS base,
             (1000000 * x.xq) % s.sq AS rem
      FROM x CROSS JOIN s),
lft AS (SELECT 1000000 - CAST(SUM(base) AS BIGINT) AS l FROM b),
rk AS (SELECT source, n, xq, base,
              ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS pos
       FROM b)
SELECT source, n AS n_tokens, CAST(xq AS BIGINT) AS weight_nano,
       CAST(base + CASE WHEN pos <= (SELECT l FROM lft)
                        THEN 1 ELSE 0 END AS BIGINT) AS token_budget
FROM rk ORDER BY source
"""


def q_revenue_decomposition(sf_dir: str):
    """Revenue-bridge decomposition between shipping-window halves
    over parts traded in both: ΔR = price effect + volume effect +
    interaction — the "why did revenue move" waterfall finance reads
    next to q_price_index. With per-part prices the rationals C/Q,
    price effect Σ((C1·Q0)⫽Q1 − C0) and volume effect
    Σ((C0·Q1)⫽Q0 − C0) are exact integer floor-division folds and the
    interaction term is defined as the exact remainder ΔR − price −
    volume, so the bridge closes to the cent by construction. Shares
    of |ΔR| quantize once each."""
    from ray.data.aggregate import Max, Min

    lim = _read(sf_dir, "lineitem", columns=["l_shipdate"]).aggregate(
        Min("l_shipdate"), Max("l_shipdate"))
    t0 = int(np.datetime64(lim["min(l_shipdate)"], "us").astype(np.int64))
    t1 = int(np.datetime64(lim["max(l_shipdate)"], "us").astype(np.int64))
    mid = (t0 + t1) // 2

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_quantity",
                        "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["l_shipdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        first = us < mid
        q = np.floor(batch["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        c = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "p": batch["l_partkey"].to_numpy(),
            "q0": np.where(first, q, 0), "c0": np.where(first, c, 0),
            "q1": np.where(first, 0, q), "c1": np.where(first, 0, c),
        })
        return pa.Table.from_pandas(
            df.groupby("p", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("p", as_index=False)[["q0", "c0", "q1", "c1"]].sum()
    )
    both = g[(g["q0"] > 0) & (g["q1"] > 0)]
    c0 = sum(int(v) for v in both["c0"])
    c1 = sum(int(v) for v in both["c1"])
    delta = c1 - c0
    price = sum((int(a) * int(b)) // int(d) - int(e)
                for a, b, d, e in zip(both["c1"], both["q0"],
                                      both["q1"], both["c0"]))
    volume = sum((int(a) * int(b)) // int(d) - int(e)
                 for a, b, d, e in zip(both["c0"], both["q1"],
                                       both["q0"], both["c0"]))
    interaction = delta - price - volume
    ad = abs(delta) if delta != 0 else 1
    return pd.DataFrame({
        "delta_cents": [delta], "price_effect_cents": [price],
        "volume_effect_cents": [volume],
        "interaction_cents": [interaction],
        "price_share": [float(_q6(np.float64(price) / np.float64(ad)))],
        "volume_share": [float(_q6(np.float64(volume) / np.float64(ad)))],
    })


Q_REVENUE_DECOMPOSITION_SQL = """
WITH lim AS (SELECT MIN(epoch_us(l_shipdate)) AS t0,
                    MAX(epoch_us(l_shipdate)) AS t1 FROM lineitem),
c AS (SELECT l_partkey AS p,
             CAST(SUM(CASE WHEN epoch_us(l_shipdate)
                              < (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
                           ELSE 0 END) AS HUGEINT) AS q0,
             CAST(SUM(CASE WHEN epoch_us(l_shipdate)
                              < (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS HUGEINT)
               AS c0,
             CAST(SUM(CASE WHEN epoch_us(l_shipdate)
                              >= (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(l_quantity + 0.5) AS BIGINT)
                           ELSE 0 END) AS HUGEINT) AS q1,
             CAST(SUM(CASE WHEN epoch_us(l_shipdate)
                              >= (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS HUGEINT)
               AS c1
      FROM lineitem GROUP BY l_partkey),
b AS (SELECT * FROM c WHERE q0 > 0 AND q1 > 0),
m AS (SELECT CAST(SUM(c1 - c0) AS HUGEINT) AS delta,
             CAST(SUM((c1 * q0) // q1 - c0) AS HUGEINT) AS price,
             CAST(SUM((c0 * q1) // q0 - c0) AS HUGEINT) AS volume
      FROM b),
f AS (SELECT delta, price, volume, delta - price - volume AS inter,
             CASE WHEN delta = 0 THEN 1 ELSE abs(delta) END AS ad
      FROM m)
SELECT CAST(delta AS BIGINT) AS delta_cents,
       CAST(price AS BIGINT) AS price_effect_cents,
       CAST(volume AS BIGINT) AS volume_effect_cents,
       CAST(inter AS BIGINT) AS interaction_cents,
       floor(CAST(price AS DOUBLE) / CAST(ad AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS price_share,
       floor(CAST(volume AS DOUBLE) / CAST(ad AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS volume_share
FROM f
"""


def q_interval_coverage(sf_dir: str):
    """Interval-UNION coverage: merge each customer's overlapping
    [orderdate, shipdate] intervals (order → latest line ship) and
    report covered days vs span days — the open-exposure number
    q_interval_join's pairwise overlaps can't give (union length is
    not a pairwise property). The merge is a per-customer sweep over
    (start, end) day pairs inside one entity shuffle (classic
    gaps-and-islands: an island breaks where start > running max
    end); covered/span sums are exact integer days; one quantized
    utilization ratio."""
    from ..stages.temporal import grouped_map

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def line_cells(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(batch["l_shipdate"], pa.timestamp("us")),
                    pa.int64()).to_numpy() // 86_400_000_000
        df = pd.DataFrame({"o": batch["l_orderkey"].to_numpy(), "e": d})
        return pa.Table.from_pandas(
            df.groupby("o", as_index=False).max(), preserve_index=False)

    from ray.data.aggregate import Max

    ship = (
        li.map_batches(line_cells, batch_format="pyarrow")
        .groupby("o").aggregate(Max("e", alias_name="e"))
    )
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                          "o_orderdate"])
    from ..stages.partition import auto_join

    j = auto_join(od, ship, left_on="o_orderkey", right_on="o")

    def sweep(g: pd.DataFrame) -> pa.Table:
        s = (g["o_orderdate"].to_numpy("datetime64[us]")
             .astype(np.int64) // 86_400_000_000)
        df = pd.DataFrame({
            "u": g["o_custkey"].to_numpy(np.int64),
            "s": s, "e": g["e"].to_numpy(np.int64),
        }).sort_values(["u", "s", "e"], kind="stable")
        covered = spans = merged = 0
        for _u, sub in df.groupby("u", sort=False):
            ss = sub["s"].to_numpy()
            ee = sub["e"].to_numpy()
            cur_s, cur_e = int(ss[0]), int(ee[0])
            for i in range(1, len(ss)):
                if int(ss[i]) > cur_e:
                    covered += cur_e - cur_s + 1
                    merged += 1
                    cur_s, cur_e = int(ss[i]), int(ee[i])
                else:
                    cur_e = max(cur_e, int(ee[i]))
            covered += cur_e - cur_s + 1
            merged += 1
            spans += int(ee.max()) - int(ss.min()) + 1
        return pa.table({
            "covered": pa.array([covered], pa.int64()),
            "span": pa.array([spans], pa.int64()),
            "merged": pa.array([merged], pa.int64()),
            "cust": pa.array([df["u"].nunique()], pa.int64()),
        })

    g = grouped_map(j, "o_custkey", sweep).to_pandas().sum()
    covered, span = int(g["covered"]), int(g["span"])
    return pd.DataFrame({
        "n_customers": [int(g["cust"])],
        "merged_intervals": [int(g["merged"])],
        "covered_days": [covered], "span_days": [span],
        "utilization": [float(_q6(np.float64(covered)
                                  / np.float64(span)))],
    })


Q_INTERVAL_COVERAGE_SQL = """
WITH iv AS (SELECT o.o_custkey AS u,
                   epoch_us(o.o_orderdate) // 86400000000 AS s,
                   MAX(epoch_us(l.l_shipdate) // 86400000000) AS e
            FROM orders o JOIN lineitem l
              ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate),
w AS (SELECT u, s, e,
             MAX(e) OVER (PARTITION BY u ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM iv),
isl AS (SELECT u, s, e,
               SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY u ORDER BY s, e) AS island
        FROM w),
mrg AS (SELECT u, island, MIN(s) AS ms, MAX(e) AS me
        FROM isl GROUP BY u, island),
per AS (SELECT u, CAST(SUM(me - ms + 1) AS BIGINT) AS covered,
               CAST(COUNT(*) AS BIGINT) AS merged,
               CAST(MAX(me) - MIN(ms) + 1 AS BIGINT) AS span
        FROM mrg GROUP BY u)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(merged) AS BIGINT) AS merged_intervals,
       CAST(SUM(covered) AS BIGINT) AS covered_days,
       CAST(SUM(span) AS BIGINT) AS span_days,
       floor(CAST(SUM(covered) AS DOUBLE) / CAST(SUM(span) AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS utilization
FROM per
"""


def t_quiet_hours(sf_dir: str):
    """Quiet-hours profile: the longest run of consecutive
    zero-activity hours on the dense grid, plus the census of silent
    runs ≥ 6h — the maintenance-window planner's complement to
    t_peak_window. Runs resolve by the gaps-and-islands identity
    (silent hour h minus its silent-rank is constant within a run);
    all outputs are exact integers except one quantized silent
    share."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({"h": us // 3_600_000_000, "n": 1})
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    h0, h1 = int(g["h"].min()), int(g["h"].max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    silent = np.flatnonzero(grid == 0)
    n_hours = len(grid)
    if len(silent) == 0:
        return pd.DataFrame({
            "n_hours": [n_hours], "silent_hours": [0],
            "longest_quiet_run": [0], "runs_ge_6h": [0],
            "silent_share": [0.0],
        })
    island = silent - np.arange(len(silent))
    _ids, counts = np.unique(island, return_counts=True)
    return pd.DataFrame({
        "n_hours": [n_hours], "silent_hours": [int(len(silent))],
        "longest_quiet_run": [int(counts.max())],
        "runs_ge_6h": [int((counts >= 6).sum())],
        "silent_share": [float(_q6(np.float64(len(silent))
                                   / np.float64(n_hours)))],
    })


T_QUIET_HOURS_SQL = """
WITH b AS (SELECT epoch_us(ts) // 3600000000 AS h,
                  CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
lim AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM b),
grid AS (SELECT gs.hh AS h, COALESCE(b.n, 0) AS n
         FROM lim, unnest(generate_series(lim.h0, lim.h1)) AS gs(hh)
         LEFT JOIN b ON b.h = gs.hh),
s AS (SELECT h, h - ROW_NUMBER() OVER (ORDER BY h) AS island
      FROM grid WHERE n = 0),
runs AS (SELECT island, CAST(COUNT(*) AS BIGINT) AS len
         FROM s GROUP BY island),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hours FROM grid),
m AS (SELECT CAST(COALESCE(SUM(len), 0) AS BIGINT) AS silent,
             CAST(COALESCE(MAX(len), 0) AS BIGINT) AS longest,
             CAST(COALESCE(COUNT(*) FILTER (len >= 6), 0) AS BIGINT)
               AS ge6
      FROM runs)
SELECT t.n_hours, m.silent AS silent_hours,
       m.longest AS longest_quiet_run, m.ge6 AS runs_ge_6h,
       floor(CAST(m.silent AS DOUBLE) / CAST(t.n_hours AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS silent_share
FROM t CROSS JOIN m
"""


def t_hhi_trend(sf_dir: str):
    """Weekly customer-revenue concentration trend: per-week HHI
    (q_hhi's exact integer ratio Σrev²/(Σrev)², quantized to micro
    units) plus the OLS slope over (week index, HHI micro-int) —
    "is revenue concentrating?" as one number. Because each weekly
    HHI is an INTEGER after its single quantize, the regression
    moments fold exactly and the slope is one quantized ratio; the
    exchange is per-batch (week, customer) revenue partials folded
    through one keyed reduction."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "w": us // 604_800_000_000,
            "u": batch["o_custkey"].to_numpy(),
            "rev": np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby(["w", "u"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["w", "u"]).aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    rows = []
    for w in sorted(g["w"].unique()):
        rev = [int(v) for v in g.loc[g["w"] == w, "rev"]]
        tot = sum(rev)
        sq = sum(r * r for r in rev)
        hhi_micro = int(np.floor(
            np.float64(float(sq))
            / (np.float64(float(tot)) * np.float64(float(tot)))
            * 1e6 + 0.5005))
        rows.append((int(w), len(rev), hhi_micro))
    out = pd.DataFrame(rows, columns=["week", "n_customers",
                                      "hhi_micro"])
    x = [int(v) for v in out["week"] - int(out["week"].min())]
    y = [int(v) for v in out["hhi_micro"]]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(a * a for a in x)
    sxy = sum(a * b for a, b in zip(x, y))
    den = n * sxx - sx * sx
    slope = 0.0 if den == 0 else float(_q6(
        np.float64(float(n * sxy - sx * sy)) / np.float64(float(den))
        / 1e6))
    out["hhi"] = out["hhi_micro"].to_numpy(np.float64) / 1e6
    out["slope_per_week"] = slope
    return out[["week", "n_customers", "hhi", "slope_per_week"]]


T_HHI_TREND_SQL = """
WITH c AS (SELECT epoch_us(o_orderdate) // 604800000000 AS w,
                  o_custkey,
                  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                AS BIGINT)) AS HUGEINT) AS rev
           FROM orders GROUP BY 1, 2),
h AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(floor(CAST(SUM(rev * rev) AS DOUBLE)
                        / (CAST(SUM(rev) AS DOUBLE)
                           * CAST(SUM(rev) AS DOUBLE))
                        * 1000000 + 0.5005) AS BIGINT) AS hhi_micro
      FROM c GROUP BY w),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(w - (SELECT MIN(w) FROM h)) AS HUGEINT) AS sx,
             CAST(SUM(hhi_micro) AS HUGEINT) AS sy,
             CAST(SUM(CAST(w - (SELECT MIN(w) FROM h) AS HUGEINT)
                      * (w - (SELECT MIN(w) FROM h))) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(w - (SELECT MIN(w) FROM h) AS HUGEINT)
                      * hhi_micro) AS HUGEINT) AS sxy
      FROM h),
sl AS (SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                   ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                              / CAST(n * sxx - sx * sx AS DOUBLE)
                              / 1000000 * 1000000 + 0.5005) / 1000000
              END AS slope FROM m)
SELECT h.w AS week, h.n_customers,
       h.hhi_micro / 1000000.0 AS hhi,
       sl.slope AS slope_per_week
FROM h CROSS JOIN sl ORDER BY h.w
"""


def q_tail_dependence(sf_dir: str):
    """Upper-tail dependence of quantity and extended price: with
    both thresholds the EXACT rank-⌈0.9·n⌉ elements of their margins,
    λ̂ = P(X > x₉₀ ∧ Y > y₉₀) / P(Y > y₉₀) — the joint-extremes
    number Pearson/Spearman miss (two measures can correlate 0.3 yet
    always spike together). Thresholds select by pure integer rank
    over value cells (tie-order invariant); the joint exceedance is
    one exact count; λ̂ quantizes once."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "x": np.floor(batch["l_quantity"].to_numpy() + 0.5)
                .astype(np.int64),
            "y": np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["x", "y"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["x", "y"], as_index=False)["n"].sum()
    )
    n = int(g["n"].sum())
    r90 = (9 * n + 9) // 10

    def thresh(col: str) -> int:
        m = g.groupby(col)["n"].sum().sort_index()
        cum = m.cumsum()
        return int(m.index[np.searchsorted(cum.to_numpy(), r90, "left")])

    x90, y90 = thresh("x"), thresh("y")
    joint = int(g.loc[(g["x"] > x90) & (g["y"] > y90), "n"].sum())
    ytail = int(g.loc[g["y"] > y90, "n"].sum())
    lam = 0.0 if ytail == 0 else float(_q6(
        np.float64(joint) / np.float64(ytail)))
    return pd.DataFrame({
        "n": [n], "x90": [x90], "y90": [y90],
        "joint_exceed": [joint], "y_exceed": [ytail],
        "tail_lambda": [lam],
    })


Q_TAIL_DEPENDENCE_SQL = """
WITH v AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    AS y
           FROM lineitem),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
xr AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i FROM v),
yr AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS i FROM v),
th AS (SELECT
         (SELECT x FROM xr WHERE i = (9 * t.n + 9) // 10) AS x90,
         (SELECT y FROM yr WHERE i = (9 * t.n + 9) // 10) AS y90
       FROM t),
m AS (SELECT CAST(COUNT(*) FILTER (v.x > th.x90 AND v.y > th.y90)
                  AS BIGINT) AS joint,
             CAST(COUNT(*) FILTER (v.y > th.y90) AS BIGINT) AS ytail
      FROM v CROSS JOIN th)
SELECT t.n, th.x90, th.y90, m.joint AS joint_exceed,
       m.ytail AS y_exceed,
       CASE WHEN m.ytail = 0 THEN 0.0
            ELSE floor(CAST(m.joint AS DOUBLE) / CAST(m.ytail AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END AS tail_lambda
FROM t CROSS JOIN th CROSS JOIN m
"""


def q_month_end_load(sf_dir: str):
    """Month-end load concentration: per calendar month, the share of
    order revenue landing in the month's LAST three civil days — the
    quota-stuffing / batch-settlement fingerprint a uniform-by-day
    assumption misses. Month boundaries come from the civil calendar
    in both engines (pandas Timestamp vs DuckDB last_day agree by
    construction); per-month cent sums are exact integers and each
    share quantizes once."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def cells(batch: pa.Table) -> pa.Table:
        ts = pd.Series(batch["o_orderdate"].to_pandas())
        ym = ts.dt.year * 100 + ts.dt.month
        last3 = (ts.dt.days_in_month - ts.dt.day) < 3
        df = pd.DataFrame({
            "ym": ym.to_numpy(np.int64),
            "c": np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "c3": np.where(last3.to_numpy(),
                           np.floor(batch["o_totalprice"].to_numpy()
                                    * 100 + 0.5).astype(np.int64), 0),
        })
        return pa.Table.from_pandas(
            df.groupby("ym", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("ym", as_index=False)[["c", "c3"]].sum()
        .sort_values("ym")
    )
    g["share_last3"] = _q6(g["c3"].to_numpy(np.float64)
                           / g["c"].to_numpy(np.float64))
    return g.rename(columns={"c": "total_cents", "c3": "last3_cents"}) \
        .reset_index(drop=True)


Q_MONTH_END_LOAD_SQL = """
WITH o AS (SELECT CAST(date_part('year', o_orderdate) * 100
                       + date_part('month', o_orderdate) AS BIGINT)
             AS ym,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                  date_diff('day', CAST(o_orderdate AS DATE),
                            last_day(CAST(o_orderdate AS DATE))) < 3
                    AS is_last3
           FROM orders)
SELECT ym, CAST(SUM(c) AS BIGINT) AS total_cents,
       CAST(COALESCE(SUM(c) FILTER (is_last3), 0) AS BIGINT)
         AS last3_cents,
       floor(CAST(COALESCE(SUM(c) FILTER (is_last3), 0) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS share_last3
FROM o GROUP BY ym ORDER BY ym
"""


def t_periodogram(sf_dir: str):
    """Coarse integer periodogram of the hourly value series at
    candidate periods {6, 12, 24, 168}: per period, the fundamental's
    power a²+b² where a = Σ xₜ·cosq(2πkₜ/P) folds as an EXACT integer
    against a micro-quantized trig table (the shared-table discipline
    of the daily-cycle DFT, generalized) over the series truncated to
    whole cycles — so the winning period is a PURE INTEGER power
    comparison (period tie-break) and only each period's power share
    quantizes. No demeaning: the DC leak is bounded by the quantized
    table's row sum and is identical in both engines."""
    from ray.data.aggregate import Sum

    PERIODS = [6, 12, 24, 168]
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "h": us // 3_600_000_000,
            "c": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    h0, h1 = int(g["h"].min()), int(g["h"].max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[g["h"].to_numpy(np.int64) - h0] = g["c"].to_numpy(np.int64)
    powers = {}
    for p in PERIODS:
        m = (len(grid) // p) * p
        if m == 0:
            powers[p] = 0
            continue
        x = grid[:m]
        k = np.arange(m, dtype=np.int64) % p
        cq = np.floor(np.cos(2 * np.pi * np.arange(p) / p) * 1e6
                      + 0.5005).astype(np.int64)
        sq = np.floor(np.sin(2 * np.pi * np.arange(p) / p) * 1e6
                      + 0.5005).astype(np.int64)
        a = _exact_dot(x, cq[k])
        b = _exact_dot(x, sq[k])
        powers[p] = a * a + b * b
    tot = sum(powers.values())
    top = min((p for p in PERIODS
               if powers[p] == max(powers.values())))
    rows = []
    for p in PERIODS:
        share = 0.0 if tot == 0 else float(_q6(
            np.float64(float(powers[p])) / np.float64(float(tot))))
        rows.append((p, share, top))
    return pd.DataFrame(rows, columns=["period_hours", "power_share",
                                       "top_period"])


T_PERIODOGRAM_SQL = """
WITH b AS (SELECT epoch_us(ts) // 3600000000 AS h,
                  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS c
           FROM events GROUP BY 1),
lim AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM b),
grid AS MATERIALIZED (
  SELECT gs.hh - lim.h0 AS t, CAST(COALESCE(b.c, 0) AS HUGEINT) AS c
  FROM lim, unnest(generate_series(lim.h0, lim.h1)) AS gs(hh)
  LEFT JOIN b ON b.h = gs.hh),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS len FROM grid),
per AS (SELECT unnest([6, 12, 24, 168]) AS p),
tab AS (SELECT per.p, gs.k,
               CAST(floor(cos(2 * pi() * gs.k / per.p) * 1000000
                          + 0.5005) AS HUGEINT) AS cq,
               CAST(floor(sin(2 * pi() * gs.k / per.p) * 1000000
                          + 0.5005) AS HUGEINT) AS sq
        FROM per, unnest(generate_series(0, per.p - 1)) AS gs(k)),
f AS (SELECT tab.p,
             CAST(SUM(grid.c * tab.cq) AS HUGEINT) AS a,
             CAST(SUM(grid.c * tab.sq) AS HUGEINT) AS bb
      FROM grid
      JOIN tab ON tab.k = grid.t % tab.p
      WHERE grid.t < ((SELECT len FROM n) // tab.p) * tab.p
      GROUP BY tab.p),
pw AS (SELECT p, a * a + bb * bb AS power FROM f),
t AS (SELECT CAST(SUM(power) AS HUGEINT) AS tot FROM pw),
top AS (SELECT p FROM pw ORDER BY power DESC, p LIMIT 1)
SELECT pw.p AS period_hours,
       CASE WHEN t.tot = 0 THEN 0.0
            ELSE floor(CAST(pw.power AS DOUBLE) / CAST(t.tot AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END AS power_share,
       (SELECT p FROM top) AS top_period
FROM pw CROSS JOIN t ORDER BY pw.p
"""


def t_user_lifetime(sf_dir: str):
    """Observed user lifetime (last event day − first event day)
    distribution: exact element median/p90, one-day-wonder share, and
    the quantized mean — the audience-age profile retention matrices
    summarize per cohort but never as one multiset. Per-user min/max
    day reduce through one entity exchange; lifetimes are small
    integers so the fold is an O(distinct lifetimes) value-cell
    sum."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "u": batch["user_id"].to_numpy(),
            "lo": us // 86_400_000_000,
            "hi": us // 86_400_000_000,
        })
        gg = df.groupby("u", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"))
        return pa.Table.from_pandas(gg, preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .to_pandas()
    )
    life = np.sort(g["hi"].to_numpy(np.int64) - g["lo"].to_numpy(np.int64))
    n = len(life)
    med = int(life[(n + 1) // 2 - 1])
    p90 = int(life[(9 * n + 9) // 10 - 1])
    one_day = int((life == 0).sum())
    tot = _exact_sum(life)
    return pd.DataFrame({
        "n_users": [n], "median_lifetime_days": [med],
        "p90_lifetime_days": [p90], "one_day_users": [one_day],
        "mean_lifetime_days": [float(_q6(np.float64(float(tot))
                                         / np.float64(n)))],
    })


T_USER_LIFETIME_SQL = """
WITH u AS (SELECT user_id,
                  MAX(epoch_us(ts) // 86400000000)
                    - MIN(epoch_us(ts) // 86400000000) AS life
           FROM events GROUP BY user_id),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(life AS HUGEINT)) AS HUGEINT) AS tot,
             CAST(COUNT(*) FILTER (life = 0) AS BIGINT) AS od FROM u),
rk AS (SELECT life, ROW_NUMBER() OVER (ORDER BY life) AS i FROM u)
SELECT t.n AS n_users,
       (SELECT life FROM rk WHERE i = (t.n + 1) // 2)
         AS median_lifetime_days,
       (SELECT life FROM rk WHERE i = (9 * t.n + 9) // 10)
         AS p90_lifetime_days,
       t.od AS one_day_users,
       floor(CAST(t.tot AS DOUBLE) / CAST(t.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_lifetime_days
FROM t
"""


def d_embed_label_purity(sf_dir: str):
    """Label purity of a sign-bit embedding quantization: bucket each
    vector by the sign pattern of its first 8 dimensions (the
    cheapest possible LSH cell) and measure the majority-label share
    per occupied bucket plus the size-weighted overall purity — the
    two-minute answer to "do these embeddings separate the labels at
    all?" before training a probe. Sign comparisons are exact in both
    engines; counts are exact integers through an O(256 × labels)
    cell exchange; smallest-label tie-break; purities quantize
    once."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def cells(batch: pa.Table) -> pa.Table:
        m = np.vstack(batch["embedding"].to_pandas().to_numpy())
        bits = (m[:, :8] > 0).astype(np.int64)
        bucket = (bits << np.arange(8, dtype=np.int64)).sum(axis=1)
        df = pd.DataFrame({
            "b": bucket,
            "lab": batch["label"].to_numpy().astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["b", "lab"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["b", "lab"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    maj_total = 0
    n_total = int(g["n"].sum())
    for b in sorted(g["b"].unique()):
        sub = g[g["b"] == b].sort_values(["n", "lab"],
                                         ascending=[False, True],
                                         kind="stable")
        nb = int(sub["n"].sum())
        maj = int(sub["n"].iloc[0])
        maj_total += maj
        rows.append((int(b), nb, int(sub["lab"].iloc[0]),
                     float(_q6(np.float64(maj) / np.float64(nb)))))
    out = pd.DataFrame(rows, columns=["bucket", "n", "majority_label",
                                      "purity"])
    out["overall_purity"] = float(_q6(np.float64(maj_total)
                                      / np.float64(n_total)))
    return out


D_EMBED_LABEL_PURITY_SQL = """
WITH v AS (SELECT (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
                  + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
                  + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
                  + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END)
                    AS b,
                  CAST(label AS BIGINT) AS lab
           FROM embeddings),
c AS (SELECT b, lab, CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY b, lab),
mj AS (SELECT b, lab AS majority_label, n AS maj,
              ROW_NUMBER() OVER (PARTITION BY b
                                 ORDER BY n DESC, lab) AS r
       FROM c),
bt AS (SELECT b, CAST(SUM(n) AS BIGINT) AS nb FROM c GROUP BY b),
t AS (SELECT CAST(SUM(maj) AS BIGINT) AS mt FROM mj WHERE r = 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c)
SELECT CAST(bt.b AS BIGINT) AS bucket, bt.nb AS n,
       mj.majority_label,
       floor(CAST(mj.maj AS DOUBLE) / CAST(bt.nb AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS purity,
       floor(CAST(t.mt AS DOUBLE) / CAST(tot.nt AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS overall_purity
FROM bt JOIN mj ON mj.b = bt.b AND mj.r = 1
CROSS JOIN t CROSS JOIN tot
ORDER BY bt.b
"""


def q_topk_churn(sf_dir: str):
    """Top-20 customer churn between observation halves: how many of
    the first half's top-20 revenue customers are still top-20 in the
    second (overlap count + Jaccard) — the key-account stability
    number a whole-base retention rate hides. Halves split at the
    exact midpoint µs of o_orderdate; each half's top set selects by
    (revenue desc, custkey asc) over exact cent sums, so membership
    is deterministic; all outputs are integers plus one quantized
    Jaccard."""
    from ray.data.aggregate import Max, Min, Sum

    K = 20
    lim = _read(sf_dir, "orders", columns=["o_orderdate"]).aggregate(
        Min("o_orderdate"), Max("o_orderdate"))
    t0 = int(np.datetime64(lim["min(o_orderdate)"], "us")
             .astype(np.int64))
    t1 = int(np.datetime64(lim["max(o_orderdate)"], "us")
             .astype(np.int64))
    mid = (t0 + t1) // 2

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["o_orderdate"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        first = us < mid
        c = np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({
            "u": batch["o_custkey"].to_numpy(),
            "r0": np.where(first, c, 0), "r1": np.where(first, 0, c),
        })
        return pa.Table.from_pandas(
            df.groupby("u", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Sum("r0", alias_name="r0"), Sum("r1", alias_name="r1"))
        .to_pandas()
    )

    def topset(col: str) -> set:
        s = g[g[col] > 0].sort_values([col, "u"],
                                      ascending=[False, True],
                                      kind="stable")
        return set(int(v) for v in s["u"].head(K))

    a, b = topset("r0"), topset("r1")
    inter = len(a & b)
    union = len(a | b)
    return pd.DataFrame({
        "k": [K], "top_h1": [len(a)], "top_h2": [len(b)],
        "stayed": [inter],
        "jaccard": [float(_q6(np.float64(inter) / np.float64(union)))],
    })


Q_TOPK_CHURN_SQL = """
WITH lim AS (SELECT MIN(epoch_us(o_orderdate)) AS t0,
                    MAX(epoch_us(o_orderdate)) AS t1 FROM orders),
c AS (SELECT o_custkey AS u,
             CAST(SUM(CASE WHEN epoch_us(o_orderdate)
                              < (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
               AS r0,
             CAST(SUM(CASE WHEN epoch_us(o_orderdate)
                              >= (SELECT (t0 + t1) // 2 FROM lim)
                           THEN CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
               AS r1
      FROM orders GROUP BY o_custkey),
a AS (SELECT u FROM c WHERE r0 > 0 ORDER BY r0 DESC, u LIMIT 20),
b AS (SELECT u FROM c WHERE r1 > 0 ORDER BY r1 DESC, u LIMIT 20),
m AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS na,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS nb,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM a JOIN b USING (u)) AS inter)
SELECT 20 AS k, na AS top_h1, nb AS top_h2, inter AS stayed,
       floor(CAST(inter AS DOUBLE)
             / CAST(na + nb - inter AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS jaccard
FROM m
"""


def q_price_stickiness(sf_dir: str):
    """Price stickiness: per part, the share of its lineitem rows at
    its MODAL extended-price cent (mode picked by count desc, price
    asc) — then the census of sticky parts (modal share ≥ 0.8) and
    the mean modal share. List-price-driven catalogs score high;
    negotiated pricing scores low. Per-batch (part, cent) count
    partials fold driver-side (near-unique key); modal selection is
    deterministic integer comparison; shares micro-floor at 1e-9
    before the mean fold."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p": batch["l_partkey"].to_numpy(),
            "c": np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["p", "c"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["p", "c"], as_index=False)["n"].sum()
    )
    g = g.sort_values(["p", "n", "c"], ascending=[True, False, True],
                      kind="stable")
    first = g.drop_duplicates("p")
    tot = g.groupby("p")["n"].sum()
    n_parts = len(first)
    sticky = 0
    fold = 0
    for p, mode_n in zip(first["p"], first["n"]):
        t = int(tot[p])
        m = int(mode_n)
        if 5 * m >= 4 * t:  # share >= 0.8 as a pure integer test
            sticky += 1
        fold += int(np.floor(np.float64(m) / np.float64(t) * 1e9
                             + 0.5005))
    return pd.DataFrame({
        "n_parts": [n_parts], "sticky_parts": [sticky],
        "sticky_share": [float(_q6(np.float64(sticky)
                                   / np.float64(n_parts)))],
        "mean_modal_share": [float(_q6(np.float64(fold) / 1e9
                                       / np.float64(n_parts)))],
    })


Q_PRICE_STICKINESS_SQL = """
WITH c AS (SELECT l_partkey AS p,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    AS cent,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
md AS (SELECT p, n AS mode_n,
              ROW_NUMBER() OVER (PARTITION BY p
                                 ORDER BY n DESC, cent) AS r
       FROM c),
tt AS (SELECT p, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY p),
j AS (SELECT md.p, md.mode_n, tt.t FROM md JOIN tt USING (p)
      WHERE md.r = 1),
f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(COUNT(*) FILTER (5 * mode_n >= 4 * t) AS BIGINT)
               AS sticky,
             CAST(SUM(CAST(floor(CAST(mode_n AS DOUBLE)
                                 / CAST(t AS DOUBLE)
                                 * 1000000000 + 0.5005) AS BIGINT))
                  AS HUGEINT) AS fold
      FROM j)
SELECT n_parts, sticky AS sticky_parts,
       floor(CAST(sticky AS DOUBLE) / CAST(n_parts AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS sticky_share,
       floor(CAST(fold AS DOUBLE) / 1000000000
             / CAST(n_parts AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS mean_modal_share
FROM f
"""


def q_mantissa_ks(sf_dir: str):
    """Log-mantissa uniformity test — the stronger form of the
    Benford first-digit audit (q_benford): under Benford's law the
    fractional part of log₁₀(price) is Uniform[0,1), and the KS
    distance D = sup|ECDF − u| detects deviations first digits blur.
    Each distinct cent's mantissa quantizes once to a micro-int; the
    two-sided sup then evaluates as a PURE INTEGER maximum
    max(|cum·10⁶ − m_q·n|, |(cum−cnt)·10⁶ − m_q·n|) over sorted
    mantissa cells, and D quantizes once."""
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c": np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby("c", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("c", as_index=False)["n"].sum()
    )
    lg = np.log10(g["c"].to_numpy(np.float64))
    mant = lg - np.floor(lg)
    g["m"] = np.floor(mant * 1e6 + 0.5005).astype(np.int64)
    agg = g.groupby("m", as_index=False)["n"].sum().sort_values("m")
    mq = agg["m"].to_numpy(np.int64)
    cnt = agg["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)
    hi = np.abs(cum * 10**6 - mq * n)
    lo = np.abs((cum - cnt) * 10**6 - mq * n)
    d_scaled = int(max(int(hi.max()), int(lo.max())))
    return pd.DataFrame({
        "n": [n], "n_mantissa_cells": [len(agg)],
        "ks_d": [float(_q6(np.float64(d_scaled)
                           / (np.float64(n) * 1e6)))],
    })


Q_MANTISSA_KS_SQL = """
WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             AS cent,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1),
m AS (SELECT CAST(floor((log10(CAST(cent AS DOUBLE))
                         - floor(log10(CAST(cent AS DOUBLE))))
                        * 1000000 + 0.5005) AS BIGINT) AS mq,
             CAST(SUM(n) AS BIGINT) AS n
      FROM c GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS cells FROM m),
w AS (SELECT mq, n,
             SUM(n) OVER (ORDER BY mq) AS cum
      FROM m),
d AS (SELECT MAX(greatest(
               abs(CAST(cum AS HUGEINT) * 1000000
                   - CAST(mq AS HUGEINT) * (SELECT nn FROM t)),
               abs(CAST(cum - n AS HUGEINT) * 1000000
                   - CAST(mq AS HUGEINT) * (SELECT nn FROM t))))
         AS ds
      FROM w)
SELECT CAST(t.nn AS BIGINT) AS n, t.cells AS n_mantissa_cells,
       floor(CAST(d.ds AS DOUBLE)
             / (CAST(t.nn AS DOUBLE) * 1000000)
             * 1000000 + 0.5005) / 1000000 AS ks_d
FROM t CROSS JOIN d
"""


def q_psych_pricing(sf_dir: str):
    """Psychological-pricing audit: the share of extended prices whose
    cent remainder ends in .00, .95 or .99 against the 3/100 rate a
    cent-uniform price process would produce, with a binomial z —
    catalog prices are set by humans, costs are not, and this is the
    cheapest detector of which one a column is. Counts are exact
    integers from a 100-cell remainder exchange; the z is built from
    identical doubles of exact integers and quantizes once."""
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({"r": c % 100, "n": 1})
        return pa.Table.from_pandas(
            df.groupby("r", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("r", as_index=False)["n"].sum()
    )
    n = int(g["n"].sum())
    k = int(g.loc[g["r"].isin([0, 95, 99]), "n"].sum())
    # H0: p = 3/100; z = (k - 0.03n)/sqrt(n p (1-p)) = (100k - 3n)
    # / sqrt(3 * 97 * n) with an exact integer numerator
    num = 100 * k - 3 * n
    z = float(_q6(np.float64(num)
                  / np.sqrt(3.0 * 97.0 * np.float64(n))))
    return pd.DataFrame({
        "n": [n], "charm_count": [k],
        "charm_share": [float(_q6(np.float64(k) / np.float64(n)))],
        "z_vs_uniform": [z],
    })


Q_PSYCH_PRICING_SQL = """
WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    % 100 AS r
           FROM lineitem),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (r IN (0, 95, 99)) AS BIGINT) AS k
      FROM c)
SELECT n, k AS charm_count,
       floor(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS charm_share,
       floor(CAST(100 * k - 3 * n AS DOUBLE)
             / sqrt(3.0 * 97.0 * CAST(n AS DOUBLE))
             * 1000000 + 0.5005) / 1000000 AS z_vs_uniform
FROM m
"""


def t_priority_mix_drift(sf_dir: str):
    """Order-priority mix drift by month: PSI of each month's
    priority distribution against the global mix — the categorical
    drift alarm for a slowly rotting upstream enum (new code paths
    shift the mix long before volumes move). Counts are exact through
    one (month, priority) cell exchange; each PSI term
    (pₘ−p)·ln(pₘ/p) evaluates on identical doubles of exact integer
    ratios, micro-floored at 1e-9 per (month, priority) before the
    order-immune fold; zero cells get the standard 1e-6 floor in both
    engines."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", columns=["o_orderdate",
                                          "o_orderpriority"])

    def cells(batch: pa.Table) -> pa.Table:
        ts = pd.Series(batch["o_orderdate"].to_pandas())
        df = pd.DataFrame({
            "ym": (ts.dt.year * 100 + ts.dt.month).to_numpy(np.int64),
            "pr": batch["o_orderpriority"].to_pandas(),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["ym", "pr"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["ym", "pr"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    pri = sorted(g["pr"].unique())
    glob = g.groupby("pr")["n"].sum()
    n_all = int(glob.sum())
    rows = []
    for ym in sorted(g["ym"].unique()):
        sub = g[g["ym"] == ym].set_index("pr")["n"]
        nm = int(sub.sum())
        fold = 0
        for p in pri:
            pm = max(np.float64(int(sub.get(p, 0))) / np.float64(nm),
                     1e-6)
            pg = max(np.float64(int(glob[p])) / np.float64(n_all), 1e-6)
            t = (pm - pg) * np.log(pm / pg)
            fold += int(np.floor(t * 1e9 + 0.5005))
        rows.append((int(ym), nm, float(_q6(np.float64(fold) / 1e9))))
    return pd.DataFrame(rows, columns=["ym", "n_orders", "psi"])


T_PRIORITY_MIX_DRIFT_SQL = """
WITH c AS (SELECT CAST(date_part('year', o_orderdate) * 100
                       + date_part('month', o_orderdate) AS BIGINT)
             AS ym,
                  o_orderpriority AS pr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1, 2),
pri AS (SELECT DISTINCT pr FROM c),
mt AS (SELECT ym, CAST(SUM(n) AS BIGINT) AS nm FROM c GROUP BY ym),
gl AS (SELECT pr, CAST(SUM(n) AS BIGINT) AS n FROM c GROUP BY pr),
ga AS (SELECT CAST(SUM(n) AS BIGINT) AS na FROM gl),
grid AS (SELECT mt.ym, mt.nm, pri.pr,
                COALESCE(c.n, 0) AS n, gl.n AS gn, ga.na
         FROM mt CROSS JOIN pri
         LEFT JOIN c ON c.ym = mt.ym AND c.pr = pri.pr
         JOIN gl ON gl.pr = pri.pr CROSS JOIN ga),
term AS (SELECT ym, nm,
           CAST(floor(
             (greatest(CAST(n AS DOUBLE) / CAST(nm AS DOUBLE), 0.000001)
              - greatest(CAST(gn AS DOUBLE) / CAST(na AS DOUBLE),
                         0.000001))
             * ln(greatest(CAST(n AS DOUBLE) / CAST(nm AS DOUBLE),
                           0.000001)
                  / greatest(CAST(gn AS DOUBLE) / CAST(na AS DOUBLE),
                             0.000001))
             * 1000000000 + 0.5005) AS BIGINT) AS f
         FROM grid)
SELECT ym, nm AS n_orders,
       floor(CAST(SUM(f) AS DOUBLE) / 1000000000 * 1000000 + 0.5005)
         / 1000000 AS psi
FROM term GROUP BY ym, nm ORDER BY ym
"""


def q_discount_ladder(sf_dir: str):
    """Discount-ladder monotonicity: does mean quantity rise with
    every step up the discount ladder? Adjacent-level comparisons
    S_{i+1}·n_i > S_i·n_{i+1} are PURE INTEGER cross-multiplications
    of exact cell sums — no mean is ever formed as a float — so the
    inversion census (steps where quantity DROPS as discount deepens)
    is quantizer-free; per-level means quantize only for display.
    One O(levels) cell exchange."""
    ds = _read(sf_dir, "lineitem", columns=["l_discount", "l_quantity"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "d": np.floor(batch["l_discount"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
            "s": np.floor(batch["l_quantity"].to_numpy() + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("d", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("d", as_index=False)[["n", "s"]].sum()
        .sort_values("d")
    )
    d = [int(v) for v in g["d"]]
    n = [int(v) for v in g["n"]]
    s = [int(v) for v in g["s"]]
    inversions = sum(
        1 for i in range(len(d) - 1)
        if s[i + 1] * n[i] < s[i] * n[i + 1])
    rows = []
    for i in range(len(d)):
        rows.append((d[i], n[i], float(_q6(
            np.float64(s[i]) / np.float64(n[i])))))
    out = pd.DataFrame(rows, columns=["discount_pct", "n",
                                      "mean_quantity"])
    out["ladder_inversions"] = inversions
    return out


Q_DISCOUNT_LADDER_SQL = """
WITH c AS (SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT))
                       AS HUGEINT) AS s
           FROM lineitem GROUP BY 1),
w AS (SELECT d, n, s,
             LEAD(n) OVER (ORDER BY d) AS n2,
             LEAD(s) OVER (ORDER BY d) AS s2
      FROM c),
inv AS (SELECT CAST(COUNT(*) FILTER (s2 * n < s * n2) AS BIGINT) AS k
        FROM w WHERE n2 IS NOT NULL)
SELECT c.d AS discount_pct, c.n,
       floor(CAST(c.s AS DOUBLE) / CAST(c.n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_quantity,
       inv.k AS ladder_inversions
FROM c CROSS JOIN inv ORDER BY c.d
"""


def q_trade_flows(sf_dir: str):
    """Customer-nation × supplier-nation revenue flow matrix (top 10
    cells): lineitem joins orders through the FACT×FACT orderkey
    shuffle (auto_join), while the customer→nation and
    supplier→nation lookups broadcast once via ray.put — the
    dimension sides never shuffle. Cent sums are exact integers;
    the top-10 ranks by (revenue desc, nation pair asc) so ties are
    deterministic. The imbalance diagnostic every sourcing review
    starts from."""
    import ray as _ray

    from ..stages.partition import auto_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].to_numpy(np.int64),
                    nat["n_name"].to_numpy(object)))
    cmap_ref = _ray.put(dict(zip(cust["c_custkey"].to_numpy(np.int64),
                                 cust["c_nationkey"].to_numpy(np.int64))))
    smap_ref = _ray.put(dict(zip(supp["s_suppkey"].to_numpy(np.int64),
                                 supp["s_nationkey"].to_numpy(np.int64))))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice"])
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = auto_join(li, od, left_on="l_orderkey", right_on="o_orderkey")

    class Flow:
        def __init__(self, cref=cmap_ref, sref=smap_ref):
            self.cmap = _ray.get(cref) if isinstance(
                cref, _ray.ObjectRef) else cref
            self.smap = _ray.get(sref) if isinstance(
                sref, _ray.ObjectRef) else sref

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "cn": pd.Series(batch["o_custkey"].to_numpy())
                    .map(self.cmap).to_numpy(np.int64),
                "sn": pd.Series(batch["l_suppkey"].to_numpy())
                    .map(self.smap).to_numpy(np.int64),
                "rev": np.floor(batch["l_extendedprice"].to_numpy()
                                * 100 + 0.5).astype(np.int64),
            })
            return pa.Table.from_pandas(
                df.groupby(["cn", "sn"], as_index=False).sum(),
                preserve_index=False)

    g = (
        j.map_batches(Flow, batch_format="pyarrow", concurrency=2,
                      num_cpus=0.5)
        .to_pandas()
        .groupby(["cn", "sn"], as_index=False)["rev"].sum()
    )
    g["cust_nation"] = g["cn"].map(nmap)
    g["supp_nation"] = g["sn"].map(nmap)
    g = g.sort_values(["rev", "cust_nation", "supp_nation"],
                      ascending=[False, True, True],
                      kind="stable").head(10)
    return g[["cust_nation", "supp_nation", "rev"]].rename(
        columns={"rev": "rev_cents"}).reset_index(drop=True)


Q_TRADE_FLOWS_SQL = """
WITH f AS (SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                  CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5)
                                AS BIGINT)) AS BIGINT) AS rev_cents
           FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation cn ON cn.n_nationkey = c.c_nationkey
           JOIN nation sn ON sn.n_nationkey = s.s_nationkey
           GROUP BY 1, 2)
SELECT cust_nation, supp_nation, rev_cents
FROM f ORDER BY rev_cents DESC, cust_nation, supp_nation LIMIT 10
"""


def t_props_value_corr(sf_dir: str):
    """Pearson correlation between the JSON payload's numeric k
    property and event value, per event type — the does-this-
    unparsed-field-carry-signal triage before promoting a JSON prop
    to a real column. k extracts by the same regex in both engines
    (rows without a parse are dropped on both sides); k and cent
    values are exact integers so all five moments fold exactly and
    each correlation quantizes once."""
    ds = _read(sf_dir, "events", columns=["event_type", "props",
                                          "value"])

    def cells(batch: pa.Table) -> pa.Table:
        props = pd.Series(batch["props"].to_numpy(zero_copy_only=False))
        k = props.str.extract(r'"k": (\d+)', expand=False)
        ok = k.notna().to_numpy()
        x = k[ok].astype(np.int64).to_numpy()
        y = np.floor(batch["value"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)[ok]
        df = pd.DataFrame({
            "et": pd.Series(batch["event_type"].to_numpy(
                zero_copy_only=False))[ok].to_numpy(),
            "n": 1, "sx": x, "sy": y,
            "sxx": x * x, "syy": y * y, "sxy": x * y,
        })
        return pa.Table.from_pandas(
            df.groupby("et", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("et", as_index=False)[["n", "sx", "sy", "sxx", "syy",
                                        "sxy"]].sum()
    )
    rows = []
    for _, r in g.sort_values("et").iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        num = n * int(r["sxy"]) - sx * sy
        dx = n * int(r["sxx"]) - sx * sx
        dy = n * int(r["syy"]) - sy * sy
        corr = 0.0 if dx == 0 or dy == 0 else float(_q6(
            np.float64(float(num))
            / np.sqrt(np.float64(float(dx)) * np.float64(float(dy)))))
        rows.append((r["et"], n, corr))
    return pd.DataFrame(rows, columns=["event_type", "n_parsed",
                                       "k_value_corr"])


T_PROPS_VALUE_CORR_SQL = """
WITH v AS (SELECT event_type AS et,
                  CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1),
                              '') AS HUGEINT) AS x,
                  CAST(floor(value * 100 + 0.5) AS HUGEINT) AS y
           FROM events),
m AS (SELECT et, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
      FROM v WHERE x IS NOT NULL GROUP BY et)
SELECT et AS event_type, CAST(n AS BIGINT) AS n_parsed,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
            THEN 0.0
            ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE))
                       * 1000000 + 0.5005) / 1000000 END AS k_value_corr
FROM m ORDER BY et
"""


def d_dup_locality(sf_dir: str):
    """Ingestion locality of exact duplicates: within each exact-dup
    text group, the doc_id gaps between consecutive members — near-
    zero gaps mean double-ingest at write time, huge gaps mean
    re-crawls, and the fix differs. Content travels as md5 digests
    (never text); per-group consecutive gaps are exact integers
    through one digest-keyed exchange; median gap is an exact
    element, adjacency share (gap ≤ 10) a pure integer test."""
    import hashlib

    from ..stages.temporal import grouped_map

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               split=True)

    def digest(batch: pa.Table) -> pa.Table:
        txt = pd.Series(batch["text"].to_numpy(zero_copy_only=False)) \
            .fillna("")
        h = [hashlib.md5(t.encode()).hexdigest() for t in txt]
        return pa.table({
            "doc_id": batch["doc_id"],
            "h": pa.array(h, pa.string()),
        })

    def gaps(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["h", "doc_id"], kind="stable")
        hh = g["h"].to_numpy(object)
        ids = g["doc_id"].to_numpy(np.int64)
        same = hh[1:] == hh[:-1]
        d = (ids[1:] - ids[:-1])[same]
        out = pd.DataFrame({"gap": d, "n": 1})
        out = out.groupby("gap", as_index=False).sum()
        # marker row keeps the block schema stable when a bucket (or
        # the whole corpus) has no exact-dup pairs at all
        out = pd.concat([out, pd.DataFrame({"gap": [-1], "n": [0]})],
                        ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    g = (
        grouped_map(ds.map_batches(digest, batch_format="pyarrow"), "h",
                    gaps)
        .to_pandas()
        .groupby("gap", as_index=False)["n"].sum()
        .sort_values("gap")
    )
    g = g[g["gap"] >= 0]
    if len(g) == 0 or int(g["n"].sum()) == 0:
        return pd.DataFrame({
            "n_gap_pairs": [0], "median_gap": [0], "adjacent_pairs": [0],
            "adjacent_share": [0.0],
        })
    vals = g["gap"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)
    med = int(vals[np.searchsorted(cum, (n + 1) // 2, "left")])
    adj = int(cnt[vals <= 10].sum())
    return pd.DataFrame({
        "n_gap_pairs": [n], "median_gap": [med], "adjacent_pairs": [adj],
        "adjacent_share": [float(_q6(np.float64(adj) / np.float64(n)))],
    })


D_DUP_LOCALITY_SQL = """
WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hh
           FROM documents),
s AS (SELECT doc_id - LAG(doc_id) OVER (PARTITION BY hh
                                        ORDER BY doc_id) AS gap
      FROM h),
d AS (SELECT gap FROM s WHERE gap IS NOT NULL),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (gap <= 10) AS BIGINT) AS adj FROM d),
rk AS (SELECT gap, ROW_NUMBER() OVER (ORDER BY gap) AS i FROM d)
SELECT t.n AS n_gap_pairs,
       COALESCE((SELECT gap FROM rk WHERE i = (t.n + 1) // 2), 0)
         AS median_gap,
       t.adj AS adjacent_pairs,
       CASE WHEN t.n = 0 THEN 0.0
            ELSE floor(CAST(t.adj AS DOUBLE) / CAST(t.n AS DOUBLE)
                       * 1000000 + 0.5005) / 1000000 END
         AS adjacent_share
FROM t
"""


def t_dormant_share(sf_dir: str):
    """Dormancy census at observation end: the share of ever-active
    users whose LAST event is ≥ 14 days old (plus the 7-day and
    30-day rings) — the at-risk base a weekly churn flow
    (t_growth_accounting) understates because dormancy accrues
    silently. Per-user last-event day reduces through one entity
    exchange; ring membership is pure integer day comparison; shares
    quantize once each."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "u": batch["user_id"].to_numpy(),
            "d": us // 86_400_000_000,
        })
        return pa.Table.from_pandas(
            df.groupby("u", as_index=False).max(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("u").aggregate(Max("d", alias_name="d"))
        .to_pandas()
    )
    last = g["d"].to_numpy(np.int64)
    end = int(last.max())
    n = len(last)
    age = end - last
    d7 = int((age >= 7).sum())
    d14 = int((age >= 14).sum())
    d30 = int((age >= 30).sum())
    return pd.DataFrame({
        "n_users": [n],
        "dormant_7d": [d7], "dormant_14d": [d14], "dormant_30d": [d30],
        "share_14d": [float(_q6(np.float64(d14) / np.float64(n)))],
    })


T_DORMANT_SHARE_SQL = """
WITH u AS (SELECT user_id,
                  MAX(epoch_us(ts) // 86400000000) AS d
           FROM events GROUP BY user_id),
e AS (SELECT MAX(d) AS endd FROM u),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (e.endd - u.d >= 7) AS BIGINT) AS d7,
             CAST(COUNT(*) FILTER (e.endd - u.d >= 14) AS BIGINT)
               AS d14,
             CAST(COUNT(*) FILTER (e.endd - u.d >= 30) AS BIGINT)
               AS d30
      FROM u CROSS JOIN e)
SELECT n AS n_users, d7 AS dormant_7d, d14 AS dormant_14d,
       d30 AS dormant_30d,
       floor(CAST(d14 AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS share_14d
FROM m
"""


def d_partition_balance(sf_dir: str):
    """Partition-balance audit of the engine's own key hashing: load
    per bucket when user_id hashes into B = 64 partitions via the
    public affine map ((u·2654435761 + 12345) mod (2⁶¹−1)) mod 64 —
    the pre-flight check that tells you whether an entity shuffle
    will hot-spot BEFORE you pay for it. The product exceeds int64 at
    real id ranges, so the Ray side folds Python ints / the SQL twin
    HUGEINT; loads are exact event counts; CV and the max/mean
    imbalance factor quantize once each."""
    M61 = (1 << 61) - 1
    ds = _read(sf_dir, "events", columns=["user_id"])

    def cells(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy().astype(object)
        b = ((u * 2654435761 + 12345) % M61 % 64).astype(np.int64)
        df = pd.DataFrame({"b": b, "n": 1})
        return pa.Table.from_pandas(
            df.groupby("b", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("b", as_index=False)["n"].sum()
    )
    full = pd.DataFrame({"b": range(64)}).merge(g, on="b", how="left") \
        .fillna(0)
    n = full["n"].astype(np.int64).to_numpy()
    total = int(n.sum())
    mx, mn = int(n.max()), int(n.min())
    sq = _exact_dot(n, n)
    var64 = 64 * sq - total * total  # 64² · population variance
    cv = float(_q6(np.sqrt(np.float64(float(var64)))
                   / np.float64(total)))
    return pd.DataFrame({
        "n_buckets": [64], "total": [total], "max_load": [mx],
        "min_load": [mn],
        "imbalance": [float(_q6(np.float64(mx) * 64.0
                                / np.float64(total)))],
        "cv": [cv],
    })


D_PARTITION_BALANCE_SQL = """
WITH h AS (SELECT ((CAST(user_id AS HUGEINT) * 2654435761 + 12345)
                   % 2305843009213693951) % 64 AS b
           FROM events),
g AS (SELECT gs.bb AS b,
             CAST(COALESCE(k.n, 0) AS BIGINT) AS n
      FROM unnest(generate_series(0, 63)) AS gs(bb)
      LEFT JOIN (SELECT b, CAST(COUNT(*) AS BIGINT) AS n
                 FROM h GROUP BY b) k ON k.b = gs.bb),
m AS (SELECT CAST(SUM(n) AS HUGEINT) AS total,
             CAST(MAX(n) AS BIGINT) AS mx,
             CAST(MIN(n) AS BIGINT) AS mn,
             CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sq
      FROM g)
SELECT 64 AS n_buckets, CAST(total AS BIGINT) AS total,
       mx AS max_load, mn AS min_load,
       floor(CAST(mx AS DOUBLE) * 64.0 / CAST(total AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS imbalance,
       floor(sqrt(CAST(64 * sq - total * total AS DOUBLE))
             / CAST(total AS DOUBLE) * 1000000 + 0.5005) / 1000000 AS cv
FROM m
"""


def q_margin_audit(sf_dir: str):
    """Retail-margin audit: per part, compare the average realized
    unit price (ΣextPrice / Σqty, a rational of exact integers)
    against the catalog p_retailprice — the below-retail census is a
    PURE INTEGER cross-multiplication C·100 < R·Q (no unit price is
    ever formed as a float) and the mean realized/retail ratio
    micro-floors per part before the fold. The part dimension
    broadcasts once via ray.put; per-batch (part, qty, cents)
    partials fold through one part-keyed reduction."""
    import ray as _ray

    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_retailprice"]).to_pandas()
    rmap_ref = _ray.put(dict(zip(
        part["p_partkey"].to_numpy(np.int64),
        np.floor(part["p_retailprice"].to_numpy() * 100 + 0.5)
        .astype(np.int64))))

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p": batch["l_partkey"].to_numpy(),
            "q": np.floor(batch["l_quantity"].to_numpy() + 0.5)
                .astype(np.int64),
            "c": np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
        })
        return pa.Table.from_pandas(
            df.groupby("p", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("p").aggregate(Sum("q", alias_name="q"),
                                Sum("c", alias_name="c"))
        .to_pandas()
    )
    rmap = _ray.get(rmap_ref)
    below = 0
    fold = 0
    n_parts = len(g)
    for p, q, c in zip(g["p"], g["q"], g["c"]):
        r = int(rmap[int(p)])
        qi, ci = int(q), int(c)
        if ci * 100 < r * qi:  # avg unit cents < retail cents, exact
            below += 1
        ratio = np.float64(ci * 100) / np.float64(r * qi)
        fold += int(np.floor(ratio * 1e9 + 0.5005))
    return pd.DataFrame({
        "n_parts": [n_parts], "below_retail": [below],
        "below_share": [float(_q6(np.float64(below)
                                  / np.float64(n_parts)))],
        "mean_price_ratio": [float(_q6(np.float64(fold) / 1e9
                                       / np.float64(n_parts)))],
    })


Q_MARGIN_AUDIT_SQL = """
WITH s AS (SELECT l_partkey AS p,
                  CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT))
                       AS HUGEINT) AS q,
                  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                AS BIGINT)) AS HUGEINT) AS c
           FROM lineitem GROUP BY 1),
j AS (SELECT s.p, s.q, s.c,
             CAST(floor(pt.p_retailprice * 100 + 0.5) AS HUGEINT) AS r
      FROM s JOIN part pt ON pt.p_partkey = s.p),
f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(COUNT(*) FILTER (c * 100 < r * q) AS BIGINT) AS below,
             CAST(SUM(CAST(floor(CAST(c * 100 AS DOUBLE)
                                 / CAST(r * q AS DOUBLE)
                                 * 1000000000 + 0.5005) AS BIGINT))
                  AS HUGEINT) AS fold
      FROM j)
SELECT n_parts, below AS below_retail,
       floor(CAST(below AS DOUBLE) / CAST(n_parts AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS below_share,
       floor(CAST(fold AS DOUBLE) / 1000000000
             / CAST(n_parts AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS mean_price_ratio
FROM f
"""


def d_dup_by_length(sf_dir: str):
    """Duplication rate by document-length decile: are long documents
    more (or less) duplicated than short ones? Exact-dup membership
    comes from md5 groups of size ≥ 2 (content travels as digests);
    decile CUT VALUES are exact rank-⌈k·n/10⌉ elements of the n_chars
    multiset and a doc's decile is the count of cuts strictly below
    its length (value-based, so ties land together deterministically).
    Counts are exact integers; one quantized rate per decile — the
    curve that decides whether dedup should run before or after
    length filtering."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        import hashlib

        txt = pd.Series(batch["text"].to_numpy(zero_copy_only=False)) \
            .fillna("")
        h = [hashlib.md5(t.encode()).hexdigest() for t in txt]
        df = pd.DataFrame({
            "h": h,
            "len": batch["n_chars"].to_numpy().astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["h", "len"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["h", "len"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # value cells of the length multiset (weights = doc counts)
    lc = g.groupby("len")["n"].sum().sort_index()
    vals = lc.index.to_numpy(np.int64)
    cnt = lc.to_numpy(np.int64)
    n = int(cnt.sum())
    cum = np.cumsum(cnt)
    cuts = [int(vals[np.searchsorted(cum, (k * n + 9) // 10, "left")])
            for k in range(1, 10)]
    dup_mask = g["n"].to_numpy(np.int64) >= 2
    dec = np.searchsorted(np.array(cuts), g["len"].to_numpy(np.int64),
                          side="left")
    rows = []
    for d in range(10):
        sel = dec == d
        nd = int(g["n"].to_numpy(np.int64)[sel].sum())
        dd = int(g["n"].to_numpy(np.int64)[sel & dup_mask].sum())
        if nd == 0:
            continue
        rows.append((d, nd, dd, float(_q6(np.float64(dd)
                                          / np.float64(nd)))))
    return pd.DataFrame(rows, columns=["decile", "n_docs", "dup_docs",
                                       "dup_rate"])


D_DUP_BY_LENGTH_SQL = """
WITH h AS (SELECT md5(coalesce(text, '')) AS hh, n_chars
           FROM documents),
grp AS (SELECT hh, n_chars, CAST(COUNT(*) AS BIGINT) AS n
        FROM h GROUP BY hh, n_chars),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
rk AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) AS i
       FROM documents),
cuts AS (SELECT ks.k,
                (SELECT n_chars FROM rk
                 WHERE i = (ks.k * (SELECT n FROM t) + 9) // 10) AS cv
         FROM (SELECT unnest(generate_series(1, 9)) AS k) ks),
dg AS (SELECT grp.hh, grp.n_chars, grp.n,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM cuts
               WHERE cuts.cv < grp.n_chars) AS decile
       FROM grp)
SELECT decile, CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(n) FILTER (n >= 2), 0) AS BIGINT) AS dup_docs,
       floor(CAST(COALESCE(SUM(n) FILTER (n >= 2), 0) AS DOUBLE)
             / CAST(SUM(n) AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS dup_rate
FROM dg GROUP BY decile ORDER BY decile
"""


def d_core_vocab(sf_dir: str):
    """Core-vocabulary census: tokens present in EVERY source, their
    count, and the share of total corpus token mass they carry — the
    transfer-learning floor ("what does every sub-corpus agree on")
    that pairwise overlap matrices (d_vocab_overlap) only show two
    sources at a time. Presence and mass are exact integers from one
    vocabulary-sized (token → source-presence count, corpus count)
    exchange; the mass share quantizes once."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "tok": ex.to_numpy(), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "tok"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_sources = g["source"].nunique()
    per = g.groupby("tok").agg(ns=("source", "size"), mass=("n", "sum"))
    total = int(per["mass"].sum())
    core = per[per["ns"] == n_sources]
    core_mass = int(core["mass"].sum())
    return pd.DataFrame({
        "n_sources": [n_sources],
        "vocab_size": [len(per)],
        "core_vocab": [len(core)],
        "core_mass_share": [float(_q6(np.float64(core_mass)
                                      / np.float64(total)))],
    })


D_CORE_VOCAB_SQL = """
WITH u AS (SELECT source,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY source, tok),
s AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS ns FROM c),
per AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS pres,
               CAST(SUM(n) AS BIGINT) AS mass
        FROM c GROUP BY tok),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(mass) AS HUGEINT) AS total,
             CAST(COUNT(*) FILTER (pres = (SELECT ns FROM s))
                  AS BIGINT) AS core,
             CAST(COALESCE(SUM(mass) FILTER (pres = (SELECT ns FROM s)),
                           0) AS HUGEINT) AS core_mass
      FROM per)
SELECT (SELECT ns FROM s) AS n_sources, vocab AS vocab_size,
       core AS core_vocab,
       floor(CAST(core_mass AS DOUBLE) / CAST(total AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS core_mass_share
FROM m
"""


def t_weekend_mix(sf_dir: str):
    """Weekend activity mix per event type: the share of each type's
    events landing on Saturday/Sunday (epoch-anchored dow, Sunday=0
    as in t_activity_heatmap) next to the 2/7 uniform baseline — the
    usage-profile split (leisure vs work product?) per funnel stage.
    Pure integer counts through an O(types) cell exchange; one
    quantized share and one quantized lift per type."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        dow = ((us // 86_400_000_000) + 4) % 7
        wknd = ((dow == 0) | (dow == 6)).astype(np.int64)
        df = pd.DataFrame({
            "et": batch["event_type"].to_pandas(),
            "n": 1, "w": wknd,
        })
        return pa.Table.from_pandas(
            df.groupby("et", as_index=False).sum(), preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("et").aggregate(Sum("n", alias_name="n"),
                                 Sum("w", alias_name="w"))
        .to_pandas().sort_values("et")
    )
    rows = []
    for _, r in g.iterrows():
        n, w = int(r["n"]), int(r["w"])
        share = np.float64(w) / np.float64(n)
        rows.append((r["et"], n, w, float(_q6(share)),
                     float(_q6(share * 7.0 / 2.0))))
    return pd.DataFrame(rows, columns=["event_type", "n", "weekend_n",
                                       "weekend_share", "weekend_lift"])


T_WEEKEND_MIX_SQL = """
WITH e AS (SELECT event_type,
                  ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow
           FROM events),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (dow = 0 OR dow = 6) AS BIGINT) AS w
      FROM e GROUP BY event_type)
SELECT event_type, n, w AS weekend_n,
       floor(CAST(w AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS weekend_share,
       floor(CAST(w AS DOUBLE) / CAST(n AS DOUBLE) * 7.0 / 2.0
             * 1000000 + 0.5005) / 1000000 AS weekend_lift
FROM m ORDER BY event_type
"""


def q_order_size_hist(sf_dir: str):
    """Order-size distribution: how many lineitems each order carries
    (including ZERO-lineitem orders, which a lineitem-only groupby can
    never see) — the basket-width histogram that sizes the per-order
    exchange every orderkey-keyed join pays. Per-batch (orderkey, n)
    partials fold driver-side (near-unique key — the multi-column Ray
    groupby trap q_dup_orders documents; at 100 TB this goes back
    through a keyed exchange); the orders side contributes only its
    exact row count, so no second fact table ever ships."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def cells(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_orderkey"]).aggregate([([], "count_all")])
        return pa.table({"k": g["l_orderkey"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    per = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby("k")["n"].sum()
    )
    tot = int(_read(sf_dir, "orders", columns=["o_orderkey"]).count())
    sizes = per.to_numpy(np.int64)
    empty = tot - len(per)
    hist = np.bincount(sizes)
    rows = []
    if empty > 0:
        rows.append((0, empty))
    for s in range(1, len(hist)):
        if hist[s] > 0:
            rows.append((int(s), int(hist[s])))
    out = pd.DataFrame(rows, columns=["size", "n_orders"])
    out["share"] = [float(_q6(np.float64(c) / np.float64(tot)))
                    for c in out["n_orders"]]
    return out


Q_ORDER_SIZE_HIST_SQL = """
WITH c AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1),
a AS (SELECT COALESCE(c.n, 0) AS sz
      FROM orders LEFT JOIN c ON o_orderkey = l_orderkey),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM orders)
SELECT sz AS size, CAST(COUNT(*) AS BIGINT) AS n_orders,
       floor(CAST(COUNT(*) AS DOUBLE) / CAST(tot AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS share
FROM a, t GROUP BY sz, tot ORDER BY sz
"""


def d_token_length_profile(sf_dir: str):
    """Per-source token-length census: token count, exact mean length,
    the exact-rank-element p90 length, and the ≥10-char long-token
    share — the tokenizer-cost fingerprint (long-token-heavy sources
    explode BPE fertility; a p90 shift between sources flags encoding
    junk or agglutinative text d_charclass's char grain smooths over).
    Per-batch (source, len) count partials feed one O(sources ×
    distinct-lengths) exchange; length sums fold as exact Python ints
    and only mean/share quantize."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        src = pd.Series(batch["source"].to_numpy(zero_copy_only=False))
        ex = (pd.Series(batch["text"].to_numpy(zero_copy_only=False))
              .fillna("").str.findall(r"\S+").explode().dropna())
        df = pd.DataFrame({
            "source": src.iloc[ex.index.to_numpy(np.int64)].to_numpy(),
            "len": ex.str.len().to_numpy(np.int64), "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["source", "len"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "len"]).aggregate(Sum("n", alias_name="n"))
        .to_pandas().sort_values(["source", "len"])
    )
    rows = []
    for src, grp in g.groupby("source", sort=True):
        lens = grp["len"].to_numpy(np.int64)
        ns = grp["n"].to_numpy(np.int64)
        nt = int(ns.sum())
        sl = sum(int(a) * int(b) for a, b in zip(lens, ns))
        cum = np.cumsum(ns)
        p90 = int(lens[np.searchsorted(cum, (9 * nt + 9) // 10)])
        lng = int(ns[lens >= 10].sum())
        rows.append((src, nt,
                     float(_q6(np.float64(sl) / np.float64(nt))),
                     p90,
                     float(_q6(np.float64(lng) / np.float64(nt)))))
    return pd.DataFrame(rows, columns=["source", "n_tokens", "mean_len",
                                       "p90_len", "long_share"])


D_TOKEN_LENGTH_PROFILE_SQL = """
WITH u AS (SELECT source,
                  unnest(regexp_extract_all(coalesce(text, ''), '\\S+'))
                    AS tok
           FROM documents),
c AS (SELECT source, CAST(length(tok) AS BIGINT) AS len,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY 1, 2),
s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(CAST(len AS HUGEINT) * n) AS HUGEINT) AS sl,
             CAST(COALESCE(SUM(n) FILTER (len >= 10), 0) AS BIGINT)
               AS lng
      FROM c GROUP BY 1),
w AS (SELECT source, len,
             SUM(n) OVER (PARTITION BY source ORDER BY len) AS cum
      FROM c),
p AS (SELECT w.source, CAST(MIN(w.len) AS BIGINT) AS p90
      FROM w JOIN s ON w.source = s.source
      WHERE w.cum >= (9 * s.nt + 9) // 10
      GROUP BY 1)
SELECT s.source, s.nt AS n_tokens,
       floor(CAST(sl AS DOUBLE) / CAST(nt AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS mean_len,
       p.p90 AS p90_len,
       floor(CAST(lng AS DOUBLE) / CAST(nt AS DOUBLE)
             * 1000000 + 0.5005) / 1000000 AS long_share
FROM s JOIN p ON s.source = p.source ORDER BY s.source
"""


def d_embed_dim_variance(sf_dir: str):
    """Per-dimension embedding variance census: mean and variance of
    every coordinate over the whole corpus — the dead-dimension /
    dominant-axis audit (a near-zero-variance dim wastes index width,
    one huge dim means the encoder collapsed) that d_embed_centroid's
    per-label means cannot show. Each float quantizes ONCE to a
    micro-int (floor(x·1e6 + 0.5)); per-batch per-dim (n, Σq, Σq²)
    int64 partials fold driver-side as exact Python ints (HUGEINT on
    the SQL side — an int64 Σq² wraps silently at corpus scale), and
    mean/variance quantize once per dim."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def parts(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(col[0])
        q = np.floor(flat.astype(np.float64) * 1e6 + 0.5).astype(
            np.int64).reshape(-1, d)
        return pa.table({
            "dim": np.arange(d, dtype=np.int64),
            "n": np.full(d, q.shape[0], dtype=np.int64),
            "s1": q.sum(axis=0),
            "s2": (q * q).sum(axis=0),
        })

    g = ds.map_batches(parts, batch_format="pyarrow").to_pandas()
    rows = []
    for dim, grp in g.groupby("dim", sort=True):
        n = int(grp["n"].sum())
        s1 = sum(int(v) for v in grp["s1"])
        s2 = sum(int(v) for v in grp["s2"])
        var = np.float64(n * s2 - s1 * s1) / (np.float64(n)
                                              * np.float64(n) * 1e12)
        rows.append((int(dim), n,
                     float(_q6(np.float64(s1) / (np.float64(n) * 1e6))),
                     float(_q6(var))))
    return pd.DataFrame(rows, columns=["dim", "n", "mean_v", "var_v"])


D_EMBED_DIM_VARIANCE_SQL = """
WITH u AS (SELECT unnest(embedding) AS e,
                  unnest(range(0, len(embedding))) AS dim
           FROM embeddings),
m AS (SELECT CAST(dim AS BIGINT) AS dim,
             CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
               AS q
      FROM u),
s AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS HUGEINT) AS s1,
             CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS s2
      FROM m GROUP BY 1)
SELECT dim, n,
       floor(CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
             * 1000000 + 0.5005) / 1000000 AS mean_v,
       floor(CAST(n * s2 - s1 * s1 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12)
             * 1000000 + 0.5005) / 1000000 AS var_v
FROM s ORDER BY dim
"""


def q_order_reconcile(sf_dir: str):
    """Header-vs-detail reconciliation audit: does o_totalprice equal
    the order's Σ extendedprice·(1−discount)·(1+tax)? Every charge is
    the PURE INTEGER product cents·(100−d)·(100+t) in ten-thousandths
    of a cent — no float ever enters the fold — so match/over/under
    and the gap sums are exact. Per-batch partials pre-sum, one
    orderkey-keyed Ray aggregate builds per-order charges, and the
    header attaches through auto_join's FACT×FACT hash path (orders
    is corpus-scale — never broadcast); the final census folds
    driver-side as Python ints from O(batches) partial rows."""
    from ray.data.aggregate import Sum
    from ..stages.partition import auto_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_tax"])
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def charges(batch: pa.Table) -> pa.Table:
        c = np.floor(batch["l_extendedprice"].to_numpy() * 100
                     + 0.5).astype(np.int64)
        d = np.floor(batch["l_discount"].to_numpy() * 100
                     + 0.5).astype(np.int64)
        t = np.floor(batch["l_tax"].to_numpy() * 100 + 0.5).astype(
            np.int64)
        df = pd.DataFrame({
            "k": batch["l_orderkey"].to_numpy(),
            "chg": c * (100 - d) * (100 + t),
        })
        return pa.Table.from_pandas(
            df.groupby("k", as_index=False).sum(), preserve_index=False)

    per = (
        li.map_batches(charges, batch_format="pyarrow")
        .groupby("k").aggregate(Sum("chg", alias_name="chg"))
    )

    def hdr(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "hc": pa.array(
                np.floor(batch["o_totalprice"].to_numpy() * 100
                         + 0.5).astype(np.int64) * 10000),
        })

    j = auto_join(per, od.map_batches(hdr, batch_format="pyarrow"),
                  left_on="k", right_on="o_orderkey")

    def stats(batch: pa.Table) -> pa.Table:
        gap = (batch["chg"].to_numpy(zero_copy_only=False)
               - batch["hc"].to_numpy(zero_copy_only=False))
        return pa.table({
            "n": [np.int64(len(gap))],
            "match": [np.int64((gap == 0).sum())],
            "over": [np.int64((gap > 0).sum())],
            "under": [np.int64((gap < 0).sum())],
            "sabs": [np.int64(np.abs(gap).sum())],
            "mabs": [np.int64(np.abs(gap).max()) if len(gap)
                     else np.int64(0)],
        })

    parts = j.map_batches(stats, batch_format="pyarrow").to_pandas()
    n = sum(int(v) for v in parts["n"])
    sabs = sum(int(v) for v in parts["sabs"])
    return pd.DataFrame({
        "n_orders": [n],
        "matched": [sum(int(v) for v in parts["match"])],
        "over": [sum(int(v) for v in parts["over"])],
        "under": [sum(int(v) for v in parts["under"])],
        "mean_abs_gap": [float(_q6(np.float64(sabs)
                                   / (np.float64(n) * 1e6)))],
        "max_abs_gap": [float(_q6(np.float64(
            max(int(v) for v in parts["mabs"])) / 1e6))],
    })


Q_ORDER_RECONCILE_SQL = """
WITH chg AS (SELECT l_orderkey,
                    CAST(SUM(
                      CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)
                      * (100 - CAST(floor(l_discount * 100 + 0.5)
                                    AS BIGINT))
                      * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))
                    ) AS HUGEINT) AS c
             FROM lineitem GROUP BY 1),
g AS (SELECT c - CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT)
               * 10000 AS gap
      FROM chg JOIN orders ON l_orderkey = o_orderkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (gap = 0) AS BIGINT) AS matched,
       CAST(COUNT(*) FILTER (gap > 0) AS BIGINT) AS over,
       CAST(COUNT(*) FILTER (gap < 0) AS BIGINT) AS under,
       floor(CAST(SUM(abs(gap)) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE)
             * 1e6) * 1000000 + 0.5005) / 1000000 AS mean_abs_gap,
       floor(CAST(MAX(abs(gap)) AS DOUBLE) / 1e6
             * 1000000 + 0.5005) / 1000000 AS max_abs_gap
FROM g
"""


def t_hour_levene(sf_dir: str):
    """Brown–Forsythe variance-equality test of event value across the
    24 hours of day: one-way ANOVA on |x − median(hour)| — is value
    VOLATILITY time-of-day dependent (q_anova asks only about means,
    t_seasonal_strength only about hourly count levels)? Each hour's
    doubled median (lo+hi rank elements) is exact, every deviation
    z = |2·cents − m2_h| is a pure integer, and the F statistic folds
    from exact (n, Σz, Σz²) with q_anova's per-group micro-floor.
    Cells are per-batch (hour, cent, n) partials folded driver-side
    (near-unique cent key — the multi-column Ray groupby trap; at
    100 TB this goes back through a keyed exchange)."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        df = pd.DataFrame({
            "h": (us // 3_600_000_000) % 24,
            "v": np.floor(batch["value"].to_numpy() * 100 + 0.5)
                .astype(np.int64),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["h", "v"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(cells, batch_format="pyarrow")
        .to_pandas()
        .groupby(["h", "v"], as_index=False)["n"].sum()
        .sort_values(["h", "v"])
    )
    fold = 0
    N = 0
    Sz = 0
    Qz = 0
    best = None
    for h, sub in g.groupby("h", sort=True):
        v = sub["v"].to_numpy(np.int64)
        nn = sub["n"].to_numpy(np.int64)
        n_h = int(nn.sum())
        cum = np.cumsum(nn)
        lo = int(v[np.searchsorted(cum, (n_h + 1) // 2)])
        hi = int(v[np.searchsorted(cum, n_h // 2 + 1)])
        m2 = lo + hi
        z = np.abs(2 * v - m2)
        s_h = sum(int(a) * int(b) for a, b in zip(z, nn))
        q_h = sum(int(a) * int(a) * int(b) for a, b in zip(z, nn))
        N += n_h
        Sz += s_h
        Qz += q_h
        fold += int(np.floor(np.float64(float(s_h * s_h))
                             / np.float64(n_h) * 1e6 + 0.5005))
        # most-volatile hour by mean |dev|, quantized ONCE to a
        # micro-int so the argmax (hour-asc tie-break) is structural
        # in both engines
        mq = int(np.floor(np.float64(float(s_h))
                          / (2.0 * np.float64(n_h)) * 1e6 + 0.5005))
        if best is None or mq > best[1]:
            best = (int(h), mq)
    k = 24
    grp = np.float64(float(fold)) / 1e6
    ssb = grp - np.float64(float(Sz * Sz)) / np.float64(N)
    ssw = np.float64(float(Qz)) - grp
    f = (ssb / np.float64(k - 1)) / (ssw / np.float64(N - k))
    return pd.DataFrame({
        "k": [k], "n": [N], "f_stat": [float(_q6(f))],
        "top_hour": [best[0]],
        "top_mad_cents": [np.float64(best[1]) / 1e6],
    })


T_HOUR_LEVENE_SQL = """
WITH c AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
s AS (SELECT h, CAST(SUM(n) AS BIGINT) AS n_h FROM c GROUP BY 1),
w AS (SELECT h, v, n, SUM(n) OVER (PARTITION BY h ORDER BY v) AS cum
      FROM c),
med AS (SELECT s.h,
          (SELECT MIN(v) FROM w WHERE w.h = s.h
             AND w.cum >= (s.n_h + 1) // 2)
          + (SELECT MIN(v) FROM w WHERE w.h = s.h
               AND w.cum >= s.n_h // 2 + 1) AS m2
        FROM s),
z AS (SELECT c.h, abs(2 * c.v - med.m2) AS z, c.n
      FROM c JOIN med ON c.h = med.h),
grp AS (SELECT h, CAST(SUM(CAST(z AS HUGEINT) * n) AS HUGEINT) AS s_h,
               CAST(SUM(CAST(z AS HUGEINT) * z * n) AS HUGEINT) AS q_h,
               CAST(SUM(n) AS BIGINT) AS n_h
        FROM z GROUP BY 1),
fold AS (SELECT CAST(SUM(CAST(floor(CAST(s_h AS DOUBLE)
                    * CAST(s_h AS DOUBLE) / CAST(n_h AS DOUBLE)
                    * 1e6 + 0.5005) AS HUGEINT)) AS HUGEINT) AS fm,
                CAST(SUM(s_h) AS HUGEINT) AS sz,
                CAST(SUM(q_h) AS HUGEINT) AS qz,
                CAST(SUM(n_h) AS BIGINT) AS nn,
                CAST(COUNT(*) AS BIGINT) AS k
         FROM grp),
top AS (SELECT h,
               CAST(floor(CAST(s_h AS DOUBLE)
                    / (2.0 * CAST(n_h AS DOUBLE)) * 1e6 + 0.5005)
                    AS BIGINT) AS mq
        FROM grp ORDER BY mq DESC, h LIMIT 1)
SELECT k, nn AS n,
       floor(((CAST(fm AS DOUBLE) / 1e6
               - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                 / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
             / ((CAST(qz AS DOUBLE) - CAST(fm AS DOUBLE) / 1e6)
                / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
             * 1000000 + 0.5005) / 1000000 AS f_stat,
       (SELECT h FROM top) AS top_hour,
       (SELECT CAST(mq AS DOUBLE) / 1e6 FROM top) AS top_mad_cents
FROM fold
"""


def q_linenumber_audit(sf_dir: str):
    """Line-number contiguity audit: within each order, l_linenumber
    must run 1..n with no gaps or duplicates — the detail-table
    integrity invariant CDC re-ingestion breaks first (t_integrity
    covers the event stream; q_key_audit only header keys). Per-batch
    (orderkey, linenumber) pairs dedup locally and fold driver-side
    (near-unique key); contiguity is the pure integer test
    distinct == max == count with min == 1. All outputs exact ints
    plus one quantized violation share."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch["l_orderkey"].to_numpy(),
            "ln": batch["l_linenumber"].to_numpy(),
            "n": 1,
        })
        return pa.Table.from_pandas(
            df.groupby(["k", "ln"], as_index=False).sum(),
            preserve_index=False)

    g = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .to_pandas()
        .groupby(["k", "ln"], as_index=False)["n"].sum()
    )
    per = g.groupby("k").agg(
        rows=("n", "sum"), distinct=("ln", "size"),
        mx=("ln", "max"), mn=("ln", "min"))
    n_orders = len(per)
    dup = per["rows"] > per["distinct"]
    ok = (~dup) & (per["mn"] == 1) & (per["mx"] == per["distinct"])
    gap = (~dup) & ~ok
    bad = n_orders - int(ok.sum())
    return pd.DataFrame({
        "n_orders": [n_orders],
        "contiguous": [int(ok.sum())],
        "dup_line_orders": [int(dup.sum())],
        "gap_orders": [int(gap.sum())],
        "max_linenumber": [int(per["mx"].max())],
        "violation_share": [float(_q6(np.float64(bad)
                                      / np.float64(n_orders)))],
    })


Q_LINENUMBER_AUDIT_SQL = """
WITH per AS (SELECT l_orderkey,
                    CAST(COUNT(*) AS BIGINT) AS rows_,
                    CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS d,
                    CAST(MAX(l_linenumber) AS BIGINT) AS mx,
                    CAST(MIN(l_linenumber) AS BIGINT) AS mn
             FROM lineitem GROUP BY 1),
f AS (SELECT rows_ > d AS dup,
             rows_ = d AND mn = 1 AND mx = d AS ok, mx
      FROM per)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (ok) AS BIGINT) AS contiguous,
       CAST(COUNT(*) FILTER (dup) AS BIGINT) AS dup_line_orders,
       CAST(COUNT(*) FILTER (NOT ok AND NOT dup) AS BIGINT)
         AS gap_orders,
       CAST(MAX(mx) AS BIGINT) AS max_linenumber,
       floor(CAST(COUNT(*) FILTER (NOT ok) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1000000 + 0.5005) / 1000000
         AS violation_share
FROM f
"""


# ---------------------------------------------------------------------------
# registry

QUERIES: dict[str, tuple] = {
    "fe_unary": (fe_unary, FE_UNARY_SQL),
    "fe_scaling": (fe_scaling, FE_SCALING_SQL),
    "fe_npfun": (fe_npfun, FE_NPFUN_SQL),
    "fe_winsorize": (fe_winsorize, FE_WINSORIZE_SQL),
    "fe_discretize": (fe_discretize, FE_DISCRETIZE_SQL),
    "fe_impute": (fe_impute, FE_IMPUTE_SQL),
    "fe_onehot": (fe_onehot, FE_ONEHOT_SQL),
    "fe_groupbythen": (fe_groupbythen, FE_GROUPBYTHEN_SQL),
    "fe_binary": (fe_binary, FE_BINARY_SQL),
    "fe_robust": (fe_robust, FE_ROBUST_SQL),
    "fe_qcut": (fe_qcut, FE_QCUT_SQL),
    "d_mutual_info": (d_mutual_info, D_MUTUAL_INFO_SQL),
    "d_chunk": (d_chunk, D_CHUNK_SQL),
    "fe_ranknorm": (fe_ranknorm, FE_RANKNORM_SQL),
    "fe_target_encode": (fe_target_encode, FE_TARGET_ENCODE_SQL),
    "q_pricing_summary": (q_pricing_summary, Q_PRICING_SQL),
    "q_top_revenue": (q_top_revenue, Q_TOP_REVENUE_SQL),
    "q_broadcast_join": (q_broadcast_join, Q_BROADCAST_JOIN_SQL),
    "q_semi_join": (q_semi_join, Q_SEMI_JOIN_SQL),
    "q_anti_join": (q_anti_join, Q_ANTI_JOIN_SQL),
    "q_range_join": (q_range_join, Q_RANGE_JOIN_SQL),
    "q_distinct_parts": (q_distinct_parts, Q_DISTINCT_SQL),
    "q_filter_sort_topk": (q_filter_sort_topk, Q_TOPK_SQL),
    "q_union_distinct": (q_union_distinct, Q_UNION_DISTINCT_SQL),
    "q_shuffle_join": (q_shuffle_join, Q_SHUFFLE_JOIN_SQL),
    "q_skew_join": (q_skew_join, Q_SKEW_JOIN_SQL),
    "q_approx_distinct": (q_approx_distinct, Q_APPROX_DISTINCT_SQL),
    "q_corr": (q_corr, Q_CORR_SQL),
    "q_rollup": (q_rollup, Q_ROLLUP_SQL),
    "q_cube": (q_cube, Q_CUBE_SQL),
    "q_left_join": (q_left_join, Q_LEFT_JOIN_SQL),
    "q_full_outer_join": (q_full_outer_join, Q_FULL_OUTER_JOIN_SQL),
    "q_string_agg": (q_string_agg, Q_STRING_AGG_SQL),
    "t_fill_forward": (t_fill_forward, T_FILL_FORWARD_SQL),
    "d_mad_filter": (d_mad_filter, D_MAD_FILTER_SQL),
    "d_token_budget": (d_token_budget, D_TOKEN_BUDGET_SQL),
    "q_grouped_p90_cont": (q_grouped_p90_cont, Q_GROUPED_P90_CONT_SQL),
    "d_embed_decontaminate": (d_embed_decontaminate, D_EMBED_DECONTAMINATE_SQL),
    "q_skew_report": (q_skew_report, Q_SKEW_REPORT_SQL),
    "d_span_mask": (d_span_mask, D_SPAN_MASK_SQL),
    "m_decode_png": (m_decode_png, None),
    "m_decode_jpeg": (m_decode_jpeg, None),
    "m_audio_spectral": (m_audio_spectral, None),
    "m_phash_dedup": (m_phash_dedup, None),
    "q_three_way_join": (q_three_way_join, Q_THREE_WAY_JOIN_SQL),
    "d_cms_counts": (d_cms_counts, D_CMS_COUNTS_SQL),
    "q_salted_agg": (q_salted_agg, Q_SALTED_AGG_SQL),
    "q_skyline": (q_skyline, Q_SKYLINE_SQL),
    "d_dup_cluster_sizes": (d_dup_cluster_sizes, D_DUP_CLUSTER_SIZES_SQL),
    "d_prefix_dedup": (d_prefix_dedup, D_PREFIX_DEDUP_SQL),
    "d_interleave": (d_interleave, D_INTERLEAVE_SQL),
    "q_grouped_iqr": (q_grouped_iqr, Q_GROUPED_IQR_SQL),
    "q_grouped_mode": (q_grouped_mode, Q_GROUPED_MODE_SQL),
    "t_lag_lead": (t_lag_lead, T_LAG_LEAD_SQL),
    "t_sessionize": (t_sessionize, T_SESSIONIZE_SQL),
    "t_asof": (t_asof, T_ASOF_SQL),
    "t_asof_nearest": (t_asof_nearest, T_ASOF_NEAREST_SQL),
    "t_rolling": (t_rolling, T_ROLLING_SQL),
    "t_row_number": (t_row_number, T_ROW_NUMBER_SQL),
    "t_rolling_range": (t_rolling_range, T_ROLLING_RANGE_SQL),
    "t_cumsum": (t_cumsum, T_CUMSUM_SQL),
    "t_user_trend": (t_user_trend, T_USER_TREND_SQL),
    "t_ewma": (t_ewma, T_EWMA_SQL),
    "t_anomaly": (t_anomaly, T_ANOMALY_SQL),
    "t_rolling_centered": (t_rolling_centered, T_ROLLING_CENTERED_SQL),
    "d_split_leakage": (d_split_leakage, D_SPLIT_LEAKAGE_SQL),
    "t_json_extract": (t_json_extract, T_JSON_EXTRACT_SQL),
    "t_seasonality": (t_seasonality, T_SEASONALITY_SQL),
    "t_late_events": (t_late_events, T_LATE_EVENTS_SQL),
    "t_running_total": (t_running_total, T_RUNNING_TOTAL_SQL),
    "d_shard_plan": (d_shard_plan, D_SHARD_PLAN_SQL),
    "q_scd2": (q_scd2, Q_SCD2_SQL),
    "t_session_stats": (t_session_stats, T_SESSION_STATS_SQL),
    "t_ntile": (t_ntile, T_NTILE_SQL),
    "t_percent_rank": (t_percent_rank, T_PERCENT_RANK_SQL),
    "q_pivot": (q_pivot, Q_PIVOT_SQL),
    "q_unpivot": (q_unpivot, Q_UNPIVOT_SQL),
    "q_bloom_semi_join": (q_bloom_semi_join, Q_BLOOM_SEMI_JOIN_SQL),
    "d_stratified_sample": (d_stratified_sample, D_STRATIFIED_SAMPLE_SQL),
    "d_c4_filter": (d_c4_filter, D_C4_FILTER_SQL),
    "d_ccnet_buckets": (d_ccnet_buckets, D_CCNET_BUCKETS_SQL),
    "d_gopher_filter": (d_gopher_filter, D_GOPHER_FILTER_SQL),
    "q_grouped_median": (q_grouped_median, Q_GROUPED_MEDIAN_SQL),
    "q_grouped_p90": (q_grouped_p90, Q_GROUPED_P90_SQL),
    "d_exact_dedup": (d_exact_dedup, D_EXACT_DEDUP_SQL),
    "d_token_counts": (d_token_counts, D_TOKEN_COUNTS_SQL),
    "d_fertility": (d_fertility, D_FERTILITY_SQL),
    "d_quality": (d_quality, D_QUALITY_SQL),
    "d_repetition": (d_repetition, D_REPETITION_SQL),
    "d_ngram_repetition": (d_ngram_repetition, D_NGRAM_REPETITION_SQL),
    "d_pii": (d_pii, D_PII_SQL),
    "d_mixture_sample": (d_mixture_sample, D_MIXTURE_SAMPLE_SQL),
    "d_det_shuffle": (d_det_shuffle, D_DET_SHUFFLE_SQL),
    "d_dup_passages": (d_dup_passages, D_DUP_PASSAGES_SQL),
    "m_decode_wav": (m_decode_wav, None),
    "d_grouped_topn": (d_grouped_topn, D_GROUPED_TOPN_SQL),
    "d_quantile_filter": (d_quantile_filter, D_QUANTILE_FILTER_SQL),
    "t_tumbling": (t_tumbling, T_TUMBLING_SQL),
    "t_ohlc": (t_ohlc, T_OHLC_SQL),
    "t_hopping": (t_hopping, T_HOPPING_SQL),
    "d_top_tokens": (d_top_tokens, D_TOP_TOKENS_SQL),
    "d_lm_score": (d_lm_score, D_LM_SCORE_SQL),
    "d_pack": (d_pack, D_PACK_SQL),
    "d_quality_clf": (d_quality_clf, None),
    "d_tfidf": (d_tfidf, D_TFIDF_SQL),
    "d_pca": (d_pca, None),
    "d_kmeans": (d_kmeans, None),
    "d_semdedup": (d_semdedup, None),
    "d_knn": (d_knn, D_KNN_SQL),
    "d_minhash_dedup": (d_minhash_dedup, None),
    "d_components": (d_components, None),
    "q_components": (q_components, Q_COMPONENTS_SQL),
    "d_simhash_dedup": (d_simhash_dedup, None),
    "d_embedding_dedup": (d_embedding_dedup, None),
    "f_rod": (f_rod, F_ROD_SQL),
    "f_cdp": (f_cdp, F_CDP_SQL),
    "f_ctpb": (f_ctpb, F_CTPB_SQL),
    "f_ctnb": (f_ctnb, F_CTNB_SQL),
    "f_sffs": (f_sffs, None),
    "f_lifecycle": (f_lifecycle, None),
    "f_lifecycle_causal": (f_lifecycle_causal, None),
    "d_lang_id": (d_lang_id, D_LANG_ID_SQL),
    "d_lang_confusion": (d_lang_confusion, D_LANG_CONFUSION_SQL),
    "d_jaccard": (d_jaccard, D_JACCARD_SQL),
    "d_fingerprint": (d_fingerprint, None),
    "d_char_fingerprint": (d_char_fingerprint, D_CHAR_FINGERPRINT_SQL),
    "d_hash_features": (d_hash_features, D_HASH_FEATURES_SQL),
    "d_minhash_sig": (d_minhash_sig, D_MINHASH_SIG_SQL),
    "d_minhash_jaccard_est": (d_minhash_jaccard_est, D_MINHASH_JACCARD_EST_SQL),
    "d_doc_entropy": (d_doc_entropy, D_DOC_ENTROPY_SQL),
    "d_cond_entropy": (d_cond_entropy, D_COND_ENTROPY_SQL),
    "d_simhash_sig": (d_simhash_sig, D_SIMHASH_SIG_SQL),
    "d_winnow": (d_winnow, D_WINNOW_SQL),
    "d_embed_quantize": (d_embed_quantize, D_EMBED_QUANTIZE_SQL),
    "fe_woe": (fe_woe, FE_WOE_SQL),
    "d_knn_ivf": (d_knn_ivf, None),
    "m_decode": (m_decode, None),
    "m_decode_ppm": (m_decode_ppm, None),
    "m_decode_y4m": (m_decode_y4m, None),
    "m_decode_mjpeg": (m_decode_mjpeg, None),
    "tok_search": (tok_search, None),
    "tok_search_explorekit": (tok_search_explorekit, None),
    "tok_search_tree": (tok_search_tree, None),
    "tok_nested_cv": (tok_nested_cv, None),
    "tok_side_metrics": (tok_side_metrics, None),
    "f_nsga2": (f_nsga2, None),
    "f_select": (f_select, None),
    "d_dedup_apply": (d_dedup_apply, None),
    "d_dedup_apply_exact": (d_dedup_apply_exact, D_DEDUP_APPLY_EXACT_SQL),
    "d_decontaminate": (d_decontaminate, D_DECONTAMINATE_SQL),
    "tok_backfill": (tok_backfill, TOK_BACKFILL_SQL),
    "tok_resumable": (tok_resumable, TOK_RESUMABLE_SQL),
    "d_kl_mix": (d_kl_mix, D_KL_MIX_SQL),
    "d_temperature_mix": (d_temperature_mix, D_TEMPERATURE_MIX_SQL),
    "d_keyword_tag": (d_keyword_tag, D_KEYWORD_TAG_SQL),
    "d_dsir": (d_dsir, D_DSIR_SQL),
    "tok_bigram_counts": (tok_bigram_counts, TOK_BIGRAM_SQL),
    "q_intersect": (q_intersect, Q_INTERSECT_SQL),
    "q_except": (q_except, Q_EXCEPT_SQL),
    "fe_boxcox": (fe_boxcox, FE_BOXCOX_SQL),
    "fe_yeojohnson": (fe_yeojohnson, FE_YEOJOHNSON_SQL),
    "d_pagerank": (d_pagerank, D_PAGERANK_SQL),
    "tok_bpe_train": (tok_bpe_train, None),
    "tok_pmi": (tok_pmi, TOK_PMI_SQL),
    "tok_entropy": (tok_entropy, TOK_ENTROPY_SQL),
    "tok_zipf": (tok_zipf, TOK_ZIPF_SQL),
    "d_bm25": (d_bm25, D_BM25_SQL),
    "d_pii_scrub": (d_pii_scrub, D_PII_SCRUB_SQL),
    "d_norm_dedup": (d_norm_dedup, D_NORM_DEDUP_SQL),
    "d_fuzzy_join": (d_fuzzy_join, D_FUZZY_JOIN_SQL),
    "d_incremental_dedup": (d_incremental_dedup, D_INCREMENTAL_DEDUP_SQL),
    "d_weighted_sample": (d_weighted_sample, D_WEIGHTED_SAMPLE_SQL),
    "d_contamination_matrix": (d_contamination_matrix, D_CONTAMINATION_MATRIX_SQL),
    "d_embed_centroid": (d_embed_centroid, D_EMBED_CENTROID_SQL),
    "d_psi": (d_psi, D_PSI_SQL),
    "d_minhash_incremental": (d_minhash_incremental, None),
    "d_latest_version": (d_latest_version, D_LATEST_VERSION_SQL),
    "d_top_tokens_by_source": (d_top_tokens_by_source, D_TOP_TOKENS_BY_SOURCE_SQL),
    "d_knn_pq": (d_knn_pq, None),
    "tok_seq_dedup": (tok_seq_dedup, TOK_SEQ_DEDUP_SQL),
    "t_window_distinct": (t_window_distinct, T_WINDOW_DISTINCT_SQL),
    "t_funnel": (t_funnel, T_FUNNEL_SQL),
    "t_retention": (t_retention, T_RETENTION_SQL),
    "d_inverted_index": (d_inverted_index, D_INVERTED_INDEX_SQL),
    "d_blocked_fuzzy_join": (d_blocked_fuzzy_join, D_BLOCKED_FUZZY_JOIN_SQL),
    "t_transitions": (t_transitions, T_TRANSITIONS_SQL),
    "t_gap_stats": (t_gap_stats, T_GAP_STATS_SQL),
    "q_snapshot_diff": (q_snapshot_diff, Q_SNAPSHOT_DIFF_SQL),
    "d_novelty": (d_novelty, D_NOVELTY_SQL),
    "d_vocab_encode": (d_vocab_encode, D_VOCAB_ENCODE_SQL),
    "d_detokenize": (d_detokenize, D_DETOKENIZE_SQL),
    "d_oov_rate": (d_oov_rate, D_OOV_RATE_SQL),
    "q_profile": (q_profile, Q_PROFILE_SQL),
    "q_zorder": (q_zorder, Q_ZORDER_SQL),
    "tok_grep": (tok_grep, TOK_GREP_SQL),
    "d_remove_dup_spans": (d_remove_dup_spans, D_REMOVE_DUP_SPANS_SQL),
    "d_embed_outliers": (d_embed_outliers, D_EMBED_OUTLIERS_SQL),
    "d_curation_pipeline": (d_curation_pipeline, D_CURATION_PIPELINE_SQL),
    "d_lm3_score": (d_lm3_score, D_LM3_SCORE_SQL),
    "q_audit": (q_audit, Q_AUDIT_SQL),
    "d_length_buckets": (d_length_buckets, D_LENGTH_BUCKETS_SQL),
    "d_embed_dispersion": (d_embed_dispersion, D_EMBED_DISPERSION_SQL),
    "d_group_split": (d_group_split, D_GROUP_SPLIT_SQL),
    "q_histogram": (q_histogram, Q_HISTOGRAM_SQL),
    "d_covariance": (d_covariance, D_COVARIANCE_SQL),
    "q_spearman": (q_spearman, Q_SPEARMAN_SQL),
    "fe_chi2": (fe_chi2, FE_CHI2_SQL),
    "d_quantile_norm": (d_quantile_norm, D_QUANTILE_NORM_SQL),
    "d_lexical_diversity": (d_lexical_diversity, D_LEXICAL_DIVERSITY_SQL),
    "t_resample": (t_resample, T_RESAMPLE_SQL),
    "d_ks_test": (d_ks_test, D_KS_TEST_SQL),
    "d_gini": (d_gini, D_GINI_SQL),
    "d_sentence_stats": (d_sentence_stats, D_SENTENCE_STATS_SQL),
    "t_forward_window": (t_forward_window, T_FORWARD_WINDOW_SQL),
    "q_percentile_exact": (q_percentile_exact, Q_PERCENTILE_EXACT_SQL),
    "d_compress_ratio": (d_compress_ratio, None),
    "d_span_corruption": (d_span_corruption, D_SPAN_CORRUPTION_SQL),
    "d_readability": (d_readability, D_READABILITY_SQL),
    "q_upsert": (q_upsert, Q_UPSERT_SQL),
    "d_ann_recall": (d_ann_recall, None),
    "d_triangle_count": (d_triangle_count, D_TRIANGLE_COUNT_SQL),
    "d_conversation": (d_conversation, D_CONVERSATION_SQL),
    "q_table_checksum": (q_table_checksum, Q_TABLE_CHECKSUM_SQL),
    "tok_crop": (tok_crop, TOK_CROP_SQL),
    "d_html_strip": (d_html_strip, D_HTML_STRIP_SQL),
    "d_wilson_ci": (d_wilson_ci, D_WILSON_CI_SQL),
    "q_moments": (q_moments, Q_MOMENTS_SQL),
    "fe_polynomial": (fe_polynomial, FE_POLYNOMIAL_SQL),
    "fe_cyclic": (fe_cyclic, FE_CYCLIC_SQL),
    "fe_crosshash": (fe_crosshash, FE_CROSSHASH_SQL),
    "d_auc": (d_auc, D_AUC_SQL),
    "t_autocorr": (t_autocorr, T_AUTOCORR_SQL),
    "fe_count_encode": (fe_count_encode, FE_COUNT_ENCODE_SQL),
    "fe_loo_encode": (fe_loo_encode, FE_LOO_ENCODE_SQL),
    "t_cusum": (t_cusum, T_CUSUM_SQL),
    "q_grouping_sets": (q_grouping_sets, Q_GROUPING_SETS_SQL),
    "t_pct_change": (t_pct_change, T_PCT_CHANGE_SQL),
    "d_degree_stats": (d_degree_stats, D_DEGREE_STATS_SQL),
    "d_calibration": (d_calibration, D_CALIBRATION_SQL),
    "fe_hinge": (fe_hinge, FE_HINGE_SQL),
    "d_url_extract": (d_url_extract, D_URL_EXTRACT_SQL),
    "d_bloom_fpr": (d_bloom_fpr, D_BLOOM_FPR_SQL),
    "t_mann_kendall": (t_mann_kendall, T_MANN_KENDALL_SQL),
    "t_attribution": (t_attribution, T_ATTRIBUTION_SQL),
    "d_kmv_distinct": (d_kmv_distinct, D_KMV_DISTINCT_SQL),
    "d_ab_ztest": (d_ab_ztest, D_AB_ZTEST_SQL),
    "d_gains": (d_gains, D_GAINS_SQL),
    "q_null_safe_join": (q_null_safe_join, Q_NULL_SAFE_JOIN_SQL),
    "fe_rbf": (fe_rbf, FE_RBF_SQL),
    "d_lang_f1": (d_lang_f1, D_LANG_F1_SQL),
    "t_dwell_time": (t_dwell_time, T_DWELL_TIME_SQL),
    "t_rolling_median": (t_rolling_median, T_ROLLING_MEDIAN_SQL),
    "d_jackknife": (d_jackknife, D_JACKKNIFE_SQL),
    "d_preference_pairs": (d_preference_pairs, D_PREFERENCE_PAIRS_SQL),
    "d_budget_alloc": (d_budget_alloc, D_BUDGET_ALLOC_SQL),
    "q_fk_audit": (q_fk_audit, Q_FK_AUDIT_SQL),
    "d_ece": (d_ece, D_ECE_SQL),
    "d_label_noise": (d_label_noise, D_LABEL_NOISE_SQL),
    "d_hard_negative": (d_hard_negative, D_HARD_NEGATIVE_SQL),
    "q_join_size_est": (q_join_size_est, Q_JOIN_SIZE_EST_SQL),
    "t_peak_detect": (t_peak_detect, T_PEAK_DETECT_SQL),
    "t_streak": (t_streak, T_STREAK_SQL),
    "q_except_all": (q_except_all, Q_EXCEPT_ALL_SQL),
    "d_theil": (d_theil, D_THEIL_SQL),
    "d_mix_entropy": (d_mix_entropy, D_MIX_ENTROPY_SQL),
    "t_time_to_event": (t_time_to_event, T_TIME_TO_EVENT_SQL),
    "t_km": (t_km, T_KM_SQL),
    "q_weighted_median": (q_weighted_median, Q_WEIGHTED_MEDIAN_SQL),
    "d_containment": (d_containment, D_CONTAINMENT_SQL),
    "q_interval_join": (q_interval_join, Q_INTERVAL_JOIN_SQL),
    "d_kmv_setops": (d_kmv_setops, D_KMV_SETOPS_SQL),
    "q_grouped_ols": (q_grouped_ols, Q_GROUPED_OLS_SQL),
    "t_forecast_error": (t_forecast_error, T_FORECAST_ERROR_SQL),
    "d_class_balance": (d_class_balance, D_CLASS_BALANCE_SQL),
    "t_nelson_aalen": (t_nelson_aalen, T_NELSON_AALEN_SQL),
    "t_did": (t_did, T_DID_SQL),
    "fe_spline": (fe_spline, FE_SPLINE_SQL),
    "q_trimmed_mean": (q_trimmed_mean, Q_TRIMMED_MEAN_SQL),
    "t_rfm": (t_rfm, T_RFM_SQL),
    "t_time_split": (t_time_split, T_TIME_SPLIT_SQL),
    "q_pythagorean_means": (q_pythagorean_means, Q_PYTHAGOREAN_MEANS_SQL),
    "d_vocab_overlap": (d_vocab_overlap, D_VOCAB_OVERLAP_SQL),
    "t_logrank": (t_logrank, T_LOGRANK_SQL),
    "q_assoc_rules": (q_assoc_rules, Q_ASSOC_RULES_SQL),
    "q_benford": (q_benford, Q_BENFORD_SQL),
    "d_hill_tail": (d_hill_tail, D_HILL_TAIL_SQL),
    "t_ljung_box": (t_ljung_box, T_LJUNG_BOX_SQL),
    "q_runs_test": (q_runs_test, Q_RUNS_TEST_SQL),
    "q_theil_sen": (q_theil_sen, Q_THEIL_SEN_SQL),
    "q_mann_whitney": (q_mann_whitney, Q_MANN_WHITNEY_SQL),
    "d_cross_source_dups": (d_cross_source_dups, D_CROSS_SOURCE_DUPS_SQL),
    "t_changepoint": (t_changepoint, T_CHANGEPOINT_SQL),
    "q_abc": (q_abc, Q_ABC_SQL),
    "t_integrity": (t_integrity, T_INTEGRITY_SQL),
    "d_wasserstein": (d_wasserstein, D_WASSERSTEIN_SQL),
    "d_rbo": (d_rbo, D_RBO_SQL),
    "q_anova": (q_anova, Q_ANOVA_SQL),
    "t_spectral": (t_spectral, T_SPECTRAL_SQL),
    "d_bootstrap_ci": (d_bootstrap_ci, D_BOOTSTRAP_CI_SQL),
    "d_js_divergence": (d_js_divergence, D_JS_DIVERGENCE_SQL),
    "q_kendall_tau": (q_kendall_tau, Q_KENDALL_TAU_SQL),
    "d_vocab_coverage": (d_vocab_coverage, D_VOCAB_COVERAGE_SQL),
    "q_bowley": (q_bowley, Q_BOWLEY_SQL),
    "q_cramers_v": (q_cramers_v, Q_CRAMERS_V_SQL),
    "t_fano": (t_fano, T_FANO_SQL),
    "t_decayed_mean": (t_decayed_mean, T_DECAYED_MEAN_SQL),
    "d_heaps": (d_heaps, D_HEAPS_SQL),
    "t_drawdown": (t_drawdown, T_DRAWDOWN_SQL),
    "t_growth_accounting": (t_growth_accounting, T_GROWTH_ACCOUNTING_SQL),
    "t_durbin_watson": (t_durbin_watson, T_DURBIN_WATSON_SQL),
    "q_jarque_bera": (q_jarque_bera, Q_JARQUE_BERA_SQL),
    "t_cohort_ltv": (t_cohort_ltv, T_COHORT_LTV_SQL),
    "q_median_test": (q_median_test, Q_MEDIAN_TEST_SQL),
    "d_charclass": (d_charclass, D_CHARCLASS_SQL),
    "d_hash_collisions": (d_hash_collisions, D_HASH_COLLISIONS_SQL),
    "d_truncation_waste": (d_truncation_waste, D_TRUNCATION_WASTE_SQL),
    "q_share_of_parent": (q_share_of_parent, Q_SHARE_OF_PARENT_SQL),
    "t_xcorr": (t_xcorr, T_XCORR_SQL),
    "q_ratio_delta": (q_ratio_delta, Q_RATIO_DELTA_SQL),
    "t_sprt": (t_sprt, T_SPRT_SQL),
    "d_dup_threshold_curve": (d_dup_threshold_curve,
                              D_DUP_THRESHOLD_CURVE_SQL),
    "q_cohens_d": (q_cohens_d, Q_COHENS_D_SQL),
    "d_c4_funnel": (d_c4_funnel, D_C4_FUNNEL_SQL),
    "q_key_audit": (q_key_audit, Q_KEY_AUDIT_SQL),
    "q_pearson_residuals": (q_pearson_residuals, Q_PEARSON_RESIDUALS_SQL),
    "q_cvar": (q_cvar, Q_CVAR_SQL),
    "d_ngram_overlap_curve": (d_ngram_overlap_curve,
                              D_NGRAM_OVERLAP_CURVE_SQL),
    "q_welch_t": (q_welch_t, Q_WELCH_T_SQL),
    "q_hhi": (q_hhi, Q_HHI_SQL),
    "t_hour_entropy": (t_hour_entropy, T_HOUR_ENTROPY_SQL),
    "q_tukey_fences": (q_tukey_fences, Q_TUKEY_FENCES_SQL),
    "d_distinctive_tokens": (d_distinctive_tokens,
                             D_DISTINCTIVE_TOKENS_SQL),
    "t_ess": (t_ess, T_ESS_SQL),
    "d_good_turing": (d_good_turing, D_GOOD_TURING_SQL),
    "t_circular_mean": (t_circular_mean, T_CIRCULAR_MEAN_SQL),
    "q_mahalanobis": (q_mahalanobis, Q_MAHALANOBIS_SQL),
    "q_partial_corr": (q_partial_corr, Q_PARTIAL_CORR_SQL),
    "t_pinball": (t_pinball, T_PINBALL_SQL),
    "q_odds_ratio": (q_odds_ratio, Q_ODDS_RATIO_SQL),
    "t_perm_entropy": (t_perm_entropy, T_PERM_ENTROPY_SQL),
    "q_iqv": (q_iqv, Q_IQV_SQL),
    "d_token_dispersion": (d_token_dispersion, D_TOKEN_DISPERSION_SQL),
    "q_assortativity": (q_assortativity, Q_ASSORTATIVITY_SQL),
    "d_js_matrix": (d_js_matrix, D_JS_MATRIX_SQL),
    "q_spearman_price": (q_spearman_price, Q_SPEARMAN_PRICE_SQL),
    "q_theil_u": (q_theil_u, Q_THEIL_U_SQL),
    "q_gini": (q_gini, Q_GINI_SQL),
    "t_hazard": (t_hazard, T_HAZARD_SQL),
    "q_entropy_rate": (q_entropy_rate, Q_ENTROPY_RATE_SQL),
    "d_burrows_delta": (d_burrows_delta, D_BURROWS_DELTA_SQL),
    "q_lorenz": (q_lorenz, Q_LORENZ_SQL),
    "q_mcnemar": (q_mcnemar, Q_MCNEMAR_SQL),
    "d_novelty_curve": (d_novelty_curve, D_NOVELTY_CURVE_SQL),
    "q_cochran_armitage": (q_cochran_armitage, Q_COCHRAN_ARMITAGE_SQL),
    "q_capture_recapture": (q_capture_recapture, Q_CAPTURE_RECAPTURE_SQL),
    "t_markov_stationary": (t_markov_stationary, T_MARKOV_STATIONARY_SQL),
    "q_funnel_ordered": (q_funnel_ordered, Q_FUNNEL_ORDERED_SQL),
    "q_mde": (q_mde, Q_MDE_SQL),
    "d_doc_cooccur": (d_doc_cooccur, D_DOC_COOCCUR_SQL),
    "q_kruskal_wallis": (q_kruskal_wallis, Q_KRUSKAL_WALLIS_SQL),
    "q_gumbel_maxima": (q_gumbel_maxima, Q_GUMBEL_MAXIMA_SQL),
    "q_neyman_alloc": (q_neyman_alloc, Q_NEYMAN_ALLOC_SQL),
    "q_elasticity": (q_elasticity, Q_ELASTICITY_SQL),
    "t_retention_rate": (t_retention_rate, T_RETENTION_RATE_SQL),
    "d_completeness_audit": (d_completeness_audit,
                             D_COMPLETENESS_AUDIT_SQL),
    "t_reorder_gap": (t_reorder_gap, T_REORDER_GAP_SQL),
    "d_char_entropy": (d_char_entropy, D_CHAR_ENTROPY_SQL),
    "t_seasonal_strength": (t_seasonal_strength, T_SEASONAL_STRENGTH_SQL),
    "q_simpson_check": (q_simpson_check, Q_SIMPSON_CHECK_SQL),
    "t_peak_window": (t_peak_window, T_PEAK_WINDOW_SQL),
    "t_segment_migration": (t_segment_migration, T_SEGMENT_MIGRATION_SQL),
    "q_price_index": (q_price_index, Q_PRICE_INDEX_SQL),
    "t_acf_half_life": (t_acf_half_life, T_ACF_HALF_LIFE_SQL),
    "t_seasonal_mk": (t_seasonal_mk, T_SEASONAL_MK_SQL),
    "d_embed_adjacent_sim": (d_embed_adjacent_sim,
                             D_EMBED_ADJACENT_SIM_SQL),
    "q_dup_orders": (q_dup_orders, Q_DUP_ORDERS_SQL),
    "t_event_trigrams": (t_event_trigrams, T_EVENT_TRIGRAMS_SQL),
    "t_burstiness": (t_burstiness, T_BURSTINESS_SQL),
    "t_stickiness": (t_stickiness, T_STICKINESS_SQL),
    "d_sentence_dedup": (d_sentence_dedup, D_SENTENCE_DEDUP_SQL),
    "q_supply_concentration": (q_supply_concentration,
                               Q_SUPPLY_CONCENTRATION_SQL),
    "t_conversion_lag": (t_conversion_lag, T_CONVERSION_LAG_SQL),
    "q_basket_diversity": (q_basket_diversity, Q_BASKET_DIVERSITY_SQL),
    "q_ship_delay": (q_ship_delay, Q_SHIP_DELAY_SQL),
    "t_error_recovery": (t_error_recovery, T_ERROR_RECOVERY_SQL),
    "d_casing_profile": (d_casing_profile, D_CASING_PROFILE_SQL),
    "t_activity_heatmap": (t_activity_heatmap, T_ACTIVITY_HEATMAP_SQL),
    "d_keyness_g2": (d_keyness_g2, D_KEYNESS_G2_SQL),
    "d_mix_budget": (d_mix_budget, D_MIX_BUDGET_SQL),
    "q_revenue_decomposition": (q_revenue_decomposition,
                                Q_REVENUE_DECOMPOSITION_SQL),
    "q_interval_coverage": (q_interval_coverage, Q_INTERVAL_COVERAGE_SQL),
    "t_quiet_hours": (t_quiet_hours, T_QUIET_HOURS_SQL),
    "t_hhi_trend": (t_hhi_trend, T_HHI_TREND_SQL),
    "q_tail_dependence": (q_tail_dependence, Q_TAIL_DEPENDENCE_SQL),
    "q_month_end_load": (q_month_end_load, Q_MONTH_END_LOAD_SQL),
    "t_periodogram": (t_periodogram, T_PERIODOGRAM_SQL),
    "t_user_lifetime": (t_user_lifetime, T_USER_LIFETIME_SQL),
    "d_embed_label_purity": (d_embed_label_purity,
                             D_EMBED_LABEL_PURITY_SQL),
    "q_topk_churn": (q_topk_churn, Q_TOPK_CHURN_SQL),
    "q_price_stickiness": (q_price_stickiness, Q_PRICE_STICKINESS_SQL),
    "q_mantissa_ks": (q_mantissa_ks, Q_MANTISSA_KS_SQL),
    "q_psych_pricing": (q_psych_pricing, Q_PSYCH_PRICING_SQL),
    "t_priority_mix_drift": (t_priority_mix_drift,
                             T_PRIORITY_MIX_DRIFT_SQL),
    "q_discount_ladder": (q_discount_ladder, Q_DISCOUNT_LADDER_SQL),
    "q_trade_flows": (q_trade_flows, Q_TRADE_FLOWS_SQL),
    "t_props_value_corr": (t_props_value_corr, T_PROPS_VALUE_CORR_SQL),
    "d_dup_locality": (d_dup_locality, D_DUP_LOCALITY_SQL),
    "t_dormant_share": (t_dormant_share, T_DORMANT_SHARE_SQL),
    "d_partition_balance": (d_partition_balance, D_PARTITION_BALANCE_SQL),
    "q_margin_audit": (q_margin_audit, Q_MARGIN_AUDIT_SQL),
    "d_dup_by_length": (d_dup_by_length, D_DUP_BY_LENGTH_SQL),
    "d_core_vocab": (d_core_vocab, D_CORE_VOCAB_SQL),
    "t_weekend_mix": (t_weekend_mix, T_WEEKEND_MIX_SQL),
    "q_order_size_hist": (q_order_size_hist, Q_ORDER_SIZE_HIST_SQL),
    "d_token_length_profile": (d_token_length_profile,
                               D_TOKEN_LENGTH_PROFILE_SQL),
    "d_embed_dim_variance": (d_embed_dim_variance,
                             D_EMBED_DIM_VARIANCE_SQL),
    "q_order_reconcile": (q_order_reconcile, Q_ORDER_RECONCILE_SQL),
    "t_hour_levene": (t_hour_levene, T_HOUR_LEVENE_SQL),
    "q_linenumber_audit": (q_linenumber_audit, Q_LINENUMBER_AUDIT_SQL),
}
