import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (driver guidance)."""
    import ray

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
    # keep list<struct> columns (messages) as plain objects in pandas
    ctx.enable_tensor_extension_casting = False
    yield
    ray.shutdown()
