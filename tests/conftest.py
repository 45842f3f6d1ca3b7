import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _disable_thp() -> None:
    """Process-scoped THP off (PR_SET_THP_DISABLE), inherited by the
    raylet + workers forked after ray.init. Same workaround as bench.py:
    the sandbox kernel's hugepage compaction storms show up as 3-30x
    kernel-time spikes on identical Ray jobs."""
    import ctypes

    try:
        libc = ctypes.CDLL(None, use_errno=True)
        libc.prctl(41, 1, 0, 0, 0)
    except Exception:
        pass


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    if not ray.is_initialized():
        _disable_thp()
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
