"""kg_queries._CACHE is bounded by stopped-session eviction (round-4):
after ``spark.stop()`` the cached KGResult for that session must be
dropped on the next access, so a dead session's graph (and the session
object itself) is never pinned for process lifetime.

Runs in a subprocess because the suite's shared session fixture cannot
be stopped mid-suite — the check genuinely needs TWO sequential
sessions in one process (stop A, start B, observe A's entry evicted).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.heavy  # round-5 core/heavy split

import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    from llm_knowledge_graph_spark.plans import kg_queries as KQ
    from llm_knowledge_graph_spark.session import get_spark

    a = get_spark(app_name="evict-a", master="local[2]",
                  shuffle_partitions=2)
    a.sparkContext.setLogLevel("ERROR")
    KQ._kg(a, n_pages=6).canonical_nodes.count()
    assert len(KQ._CACHE) == 1 and not KQ._session_stopped(a)
    a.stop()
    assert KQ._session_stopped(a)

    b = get_spark(app_name="evict-b", master="local[2]",
                  shuffle_partitions=2)
    b.sparkContext.setLogLevel("ERROR")
    KQ._kg(b, n_pages=6).canonical_nodes.count()
    sessions = [k[0] for k in KQ._CACHE]
    assert a not in sessions, "stopped session still pinned"
    assert sessions == [b] and len(KQ._CACHE) == 1
    KQ.clear_cache()
    assert not KQ._CACHE
    b.stop()
    print("EVICTION_OK")
""").format(repo=str(REPO))


def test_cache_evicts_stopped_session():
    proc = subprocess.run([sys.executable, "-c", _SCRIPT],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "EVICTION_OK" in proc.stdout
