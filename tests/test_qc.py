"""Mention-validation filter + QC flags vs reference semantics
(/root/reference/src/utils/quality_controls.py:323-425,83-91)."""

from hinbox_ray.functions.qc import filter_entities_by_mention, qc_flags


def _ppl(name, aliases=()):
    return {"name": name, "aliases": list(aliases)}


def test_drops_unmentioned_entity():
    text = "Camp Delta holds many detainees."
    kept, rep = filter_entities_by_mention(
        [_ppl("Camp Delta"), _ppl("Camp Echo")],
        text,
        entity_type="locations",
    )
    assert [e["name"] for e in kept] == ["Camp Delta"]
    assert rep["dropped"] == 1 and rep["reasons"]["no_mention"] == 1


def test_alias_and_acronym_needles_rescue():
    text = "officials at the FBI said"
    kept, _ = filter_entities_by_mention(
        [_ppl("Federal Bureau of Investigation")],
        text,
        entity_type="organizations",
    )
    # computed acronym FBI matches
    assert len(kept) == 1
    kept, _ = filter_entities_by_mention(
        [_ppl("Some Org", aliases=["officials"])],
        text,
        entity_type="organizations",
    )
    assert len(kept) == 1


def test_short_needle_word_boundary():
    # "US" must not match inside "thus"
    kept, rep = filter_entities_by_mention(
        [{"name": "US", "aliases": []}],
        "thus it went",
        entity_type="locations",
    )
    assert kept == [] and rep["dropped"] == 1
    kept, _ = filter_entities_by_mention(
        [{"name": "US", "aliases": []}],
        "the US said",
        entity_type="locations",
    )
    assert len(kept) == 1


def test_equivalence_group_variant_rescues():
    kept, _ = filter_entities_by_mention(
        [_ppl("United States")],
        "the USA announced",
        entity_type="locations",
        equivalence_groups=[["United States", "U.S.", "USA"]],
    )
    assert len(kept) == 1


def test_events_use_title_field():
    kept, _ = filter_entities_by_mention(
        [{"title": "Annual Review", "aliases": []}],
        "the annual review began",
        entity_type="events",
    )
    assert len(kept) == 1


def test_qc_flags_thresholds():
    assert qc_flags(input_count=10, dropped=6, deduped=0) == ["high_drop_rate"]
    assert qc_flags(input_count=10, dropped=0, deduped=6) == ["many_duplicates"]
    assert "many_low_quality_names" in qc_flags(
        input_count=4,
        dropped=0,
        deduped=0,
        names=["defense departments", "security forces"],
    )
    assert "zero_entities" in qc_flags(input_count=2, dropped=1, deduped=1)
