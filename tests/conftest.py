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
    """One JSON-lines chunk == one micro-batch under maxFilesPerTrigger=1.

    The mtime stamp is load-bearing: Spark's FileStreamSource orders
    files by MODIFICATION TIME (millisecond precision), and two chunks
    written back-to-back land in the same millisecond — the tie is then
    broken unpredictably (observed REVERSED replay: 002, 001, 000),
    which silently turns early chunks into dropped-late data under a
    watermark. Chunk N gets mtime = now + N milliseconds (derived from
    the numeric filename prefix the tests already use), so replay order
    always equals chunk order.
    """
    import json
    import re
    import time

    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    m = re.match(r"(\d+)", name)
    seq = int(m.group(1)) if m else 0
    stamp = time.time() + seq * 0.001
    os.utime(path, (stamp, stamp))


def ev(event_id: int, ts: str, user_id: int = 1, etype: str = "click", value: float = 1.0) -> dict:
    return {
        "event_id": event_id,
        "ts": ts,
        "user_id": user_id,
        "event_type": etype,
        "value": value,
        "props": '{"k": %d}' % (event_id % 100),
    }
