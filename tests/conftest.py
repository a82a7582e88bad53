import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture(tmp_path_factory):
    from licenta_crawler_ray.fixtures.gen import TINY, ensure_fixture

    d = "/tmp/lcr_fixture_tiny"
    ensure_fixture(d, **TINY)
    return d


@pytest.fixture(scope="session")
def small_fixture():
    from licenta_crawler_ray.fixtures.gen import SMALL, ensure_fixture

    d = "/tmp/lcr_fixture_small"
    ensure_fixture(d, **SMALL)
    return d


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "job")
