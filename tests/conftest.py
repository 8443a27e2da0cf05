from __future__ import annotations

import pytest

from dedup.config import DedupConfig
from dedup.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="dedup-tests",
        master="local[4]",
        config=DedupConfig(shuffle_partitions=8),
    )
    yield s
    s.stop()


@pytest.fixture()
def config() -> DedupConfig:
    return DedupConfig(shuffle_partitions=8)
