"""Gate-integrity guards for the driver correctness record.

The round-6 driver record held exactly 50 rows for a 51-entry
registry — the entry registered last (codec_matrix) silently fell out
of the hard correctness signal (judge verdict r6, finding #1). These
tests keep the registry inside the observed record capacity and keep
the contract between queries() and oracle_sql() tight, so no entry can
become structurally last-and-expendable again.
"""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry
from segment_rtree_spark.plans.entry_queries import _DRIVER_RECORD_CAP, REGISTRY


def test_registry_fits_driver_record_cap():
    # CORRECTNESS_r06.json: 50 rows for 51 entries; CORRECTNESS_r05.json:
    # 47 rows for 47 entries (same last entry got a row) — the record
    # caps at 50. Exceeding it silently drops entries from the gate;
    # merge entries (see q_text_suite) instead of raising the cap.
    n = len(entry.queries())
    assert n <= _DRIVER_RECORD_CAP, (
        f"{n} registry entries > driver record cap {_DRIVER_RECORD_CAP}: "
        "the driver would silently drop the tail from CORRECTNESS_rN — "
        "merge entries (union-tag or wide-row suites) instead"
    )


def test_every_query_has_an_oracle():
    # every gated operator needs the hard (hash-exact) check; a missing
    # oracle downgrades it to rows-only without anyone noticing
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) == set(qs), sorted(set(qs) ^ set(os_))


def test_registry_tail_is_cheap_and_pytest_redundant():
    # if the record limit turns out to be a time budget rather than a
    # count cap, the tail is what falls off — keep it entries that are
    # cheap AND have independent fixture-golden pytest coverage
    tail = list(REGISTRY)[-4:]
    assert tail == ["clip_segment", "interval_union", "geom_measures",
                    "hilbert_key"], tail
