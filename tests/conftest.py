import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_pages(tmp_path_factory):
    """FIXTURES.md F1 'small': 2,000 rows, 4 files (kept modest for CI speed)."""
    from lucene_ray.sources import write_pages
    d = tmp_path_factory.mktemp("pages_small")
    paths = write_pages(str(d), n_rows=2000, n_parts=4, seed=42, n_terms=2000)
    return str(d), paths
