from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
# Executor python workers must be able to unpickle classes defined in
# test modules (e.g. sink doubles) — put tests/ on their path.
_here = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = _here + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from vanus_spark.session import get_spark

    s = get_spark("vanus_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def entry_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod_fixture", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    from vanus_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="session")
def cloudevents(events):
    from vanus_spark.model import events_to_cloudevents

    return events_to_cloudevents(events).cache()
