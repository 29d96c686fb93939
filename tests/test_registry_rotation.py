"""The driver-gate rotation contract (__spark_entry__.queries): the
correctness gate checks a fixed 50-entry prefix, so the prefix must
(a) always lead with the 15 pinned flagships, (b) rotate the remaining
35 slots so EVERY registry entry is driver-verified within a bounded
number of rounds, and (c) never contain an entry without a DuckDB
oracle. Pure registry-shape tests — no Spark session needed."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def _window_for_round(monkeypatch, r: int) -> list[str]:
    monkeypatch.setattr(entry, "_round_number", lambda: r)
    return list(entry.queries())[:50]


def test_pinned_flagships_lead_every_round(monkeypatch):
    allq = list(entry._all_queries())
    pinned = allq[: entry._N_PINNED]
    for r in range(entry._BASE_ROUND, entry._BASE_ROUND + 6):
        w = _window_for_round(monkeypatch, r)
        assert w[: entry._N_PINNED] == pinned
        assert len(w) == len(set(w)) == 50


def test_rotation_covers_full_registry_within_bounded_rounds(monkeypatch):
    allq = set(entry._all_queries())
    n_tail = len(allq) - entry._N_PINNED
    # ceil(tail / rotating-slots) rounds suffice to cover everything
    need = -(-n_tail // entry._N_ROTATING)
    covered: set[str] = set()
    for r in range(entry._BASE_ROUND, entry._BASE_ROUND + need):
        covered.update(_window_for_round(monkeypatch, r))
    assert covered == allq


def test_registry_and_oracles_consistent(monkeypatch):
    allq = entry._all_queries()
    assert list(entry.queries().keys()) != [] and set(
        entry.queries()
    ) == set(allq)
    oracles = entry.oracle_sql()
    for r in range(entry._BASE_ROUND, entry._BASE_ROUND + 3):
        for name in _window_for_round(monkeypatch, r):
            assert name in oracles, f"window entry {name} has no oracle"
