import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_n3_ray.malloctune import tune_malloc  # noqa: E402

# before any Ray session: this host has allocation-latency episodes
# (first-touch 200x slow); tuned malloc + inherited MALLOC_* env keep
# both the test driver and Ray workers off the re-fault path
tune_malloc()

from rdf_n3_ray.datatune import tune_data_context  # noqa: E402

tune_data_context()


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (BASELINE.md contract)."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    if owned:  # never shut down a session somebody else started
        ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
