from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kse.session import get_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    s = get_session("kse-tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_events_dir(tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    return str(d)


def write_event_chunk(dir_: str, name: str, rows: list[dict]) -> None:
    """One JSON-lines chunk == one micro-batch under maxFilesPerTrigger=1."""
    import json

    with open(os.path.join(dir_, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def ev(event_id: int, ts: str, user_id: int = 1, etype: str = "click", value: float = 1.0) -> dict:
    return {
        "event_id": event_id,
        "ts": ts,
        "user_id": user_id,
        "event_type": etype,
        "value": value,
        "props": '{"k": %d}' % (event_id % 100),
    }
