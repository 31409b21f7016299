import os
import shutil

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from dedup.session import build_session

    s = build_session(
        app_name="dedup-tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_smoke():
    from dedup.synth import make_corpus

    return make_corpus(SF_SMOKE, seed=42)


@pytest.fixture()
def tmp_warehouse(tmp_path):
    d = str(tmp_path / "wh")
    yield d
    shutil.rmtree(d, ignore_errors=True)
