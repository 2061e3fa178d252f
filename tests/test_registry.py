"""Introspection registry: get_name / get_ID / get_functionality parity
(wrappers.hpp:802-812 mask semantics: 1=lookup, 2=add, 4=delete)."""

import pytest

from prefix_filter_spark.registry import REGISTRY, Capability, info, supports


def test_reference_masks():
    # PF and the Bloom family: lookups + adds = 3 (wrappers.hpp:806-808)
    for s in ("prefix_filter", "bloom", "blocked_bloom"):
        assert int(info(s).functionality) == 3, s
    # CF and TC support delete: 7 (wrappers.hpp:197-199,500-502)
    for s in ("cuckoo", "two_choice"):
        assert int(info(s).functionality) == 7, s


def test_shard_column_names_resolve():
    # exactly the sketch_name strings the builders stamp on shard rows
    for col, expect in [
        ("prefix_filter", "prefix_filter"),
        ("bloom12", "bloom"),
        ("bbf256", "blocked_bloom"),
        ("tc12", "two_choice"),
        ("cuckoo12", "cuckoo"),
        ("hll14", "hll"),
        ("cms5x8192", "cms"),
        ("kll200", "kll"),
        ("tdigest200", "tdigest"),
    ]:
        assert info(col).name == expect, col


def test_supports_and_ids_unique():
    assert supports("cuckoo12", Capability.DELETE)
    assert not supports("prefix_filter", Capability.DELETE)
    assert supports("hll14", Capability.ESTIMATE)
    ids = [i.sketch_id for i in REGISTRY.values()]
    assert len(ids) == len(set(ids))


def test_unknown_raises():
    with pytest.raises(KeyError):
        info("nonesuch99")


def test_delete_entrypoints_match_mask():
    """Filters that report DELETE expose remove_keys; those that don't,
    don't (the reference throws 'Unsupported', wrappers.hpp:794-796)."""
    import importlib

    for name, si in REGISTRY.items():
        if Capability.ESTIMATE & si.functionality:
            continue
        mod = importlib.import_module(si.module)
        has_remove = hasattr(mod, "remove_keys")
        assert has_remove == bool(si.functionality & Capability.DELETE), name


def test_semisort_sketch_name_resolves():
    """The semisort cuckoo shard rows carry 'cuckoo13ss' — the
    variant suffix must resolve to the cuckoo capability entry."""
    from prefix_filter_spark import registry

    inf = registry.info("cuckoo13ss")
    assert inf.name == "cuckoo"
    assert registry.supports("cuckoo13ss", registry.Capability.DELETE)
