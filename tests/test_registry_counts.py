"""Registry/README drift gates (VERDICT r2 "Next round" item 8): the
README's standalone-query count must equal the live registry, and the
50-slot driver contract must stay exactly 50 with every member wired.
No Spark session needed — pure registry introspection."""

import os
import re

import __spark_entry__ as entry

README = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")


def test_readme_standalone_count_matches_registry():
    text = open(README).read().replace("\n  ", " ")
    m = re.search(r"every standalone query \((\d+)", text)
    assert m, "README lost its standalone-count sentence"
    assert int(m.group(1)) == len(entry._standalone_queries())


def test_readme_rows_only_and_value_counts():
    sq, so = entry._standalone_queries(), entry._standalone_oracles()
    rows_only = [k for k in sq if k not in so]
    text = open(README).read().replace("\n  ", " ")
    m = re.search(r"(\d+) queries are rows-only", text)
    assert m and int(m.group(1)) == len(rows_only), (m, rows_only)
    m = re.search(r"other (\d+) are DuckDB value checks", text)
    assert m and int(m.group(1)) == len(so)


def test_driver_contract_is_exactly_50_slots():
    qs = list(entry.queries())
    first50 = qs[:50]
    expected = (
        list(entry._FUSED_BUNDLES)
        + list(entry._FUSED_ROWS_ONLY)
        + list(entry._FLAGSHIP_ORDER)
    )
    assert first50 == expected
    assert len(expected) == 50


def test_every_bundle_member_wired():
    """Every fused-bundle member is a registered standalone query with
    a canonicalization spec; every VALUE bundle member also has an
    oracle (a member without one would silently break the bundle's
    UNION ALL oracle)."""
    from grandiso_networkx_spark.fused_spec import SPEC

    sq, so = entry._standalone_queries(), entry._standalone_oracles()
    for tag, parts in entry._FUSED_BUNDLES.items():
        for p in parts:
            assert p in sq, (tag, p)
            assert p in so, (tag, p, "value bundle member missing oracle")
            assert p in SPEC, (tag, p, "missing canonicalization spec")
    for tag, parts in entry._FUSED_ROWS_ONLY.items():
        for p in parts:
            assert p in sq, (tag, p)
            assert p not in so, (
                tag, p, "has an oracle — graduate it to a value bundle")
            assert p in SPEC, (tag, p)


def test_flagships_are_standalones_with_oracles():
    sq, so = entry._standalone_queries(), entry._standalone_oracles()
    for name in entry._FLAGSHIP_ORDER:
        assert name in sq
        assert name in so, (name, "flagship slots are value-checked")
