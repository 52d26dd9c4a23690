"""Registry iteration order is load-bearing: the driver verifies queries
in ``all_queries()`` order under a ~50-query per-round budget, so the head
of the order decides which operators get fresh CORRECTNESS rows. The order
is pinned as DATA (``registry._PRIORITY``) — these tests fail if a
refactor or an import-sorting lint pass scrambles it (ADVICE r4)."""

from __future__ import annotations

from cta_train_tracker_analytics_spark.plans import registry


def test_priority_names_lead_iteration_order():
    names = list(registry.all_queries())
    assert names[: len(registry._PRIORITY)] == registry._PRIORITY


def test_priority_names_all_registered():
    names = set(registry.all_queries())
    missing = [n for n in registry._PRIORITY if n not in names]
    assert missing == []


def test_oracles_follow_same_order():
    """all_oracles() must present the same relative order (it is the dict
    the driver actually zips with queries)."""
    qnames = [n for n in registry.all_queries() if n in registry.all_oracles()]
    assert list(registry.all_oracles()) == qnames


def test_every_query_is_explicitly_ordered():
    """The r15 age rotation promoted the last unpinned names: _PRIORITY now
    covers the ENTIRE registry, so verification order is explicit data end
    to end. The binding invariant (replacing the r4-era cheap-before-
    expensive tail check, which had become a permanent no-op once the tail
    shrank below one representative per module — ADVICE r14 #1): the tail
    must stay EMPTY. A new query that lands without a _PRIORITY entry
    would silently verify in import order behind 247 pinned names — i.e.
    never, under the ~50-row budget — violating the no-new-backlog policy
    (every new query gets its driver row the round it lands)."""
    names = list(registry.all_queries())
    unpinned = [n for n in names if n not in set(registry._PRIORITY)]
    assert unpinned == [], (
        f"queries missing from _PRIORITY (add them to the current round's "
        f"front block): {unpinned}"
    )
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))
