import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    started_here = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        started_here = True
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    if started_here:  # never tear down an embedding process's session
        ray.shutdown()
