"""Name-variant kernel tests — mirror the reference's pinned behaviors
(tests/test_name_variants.py, test_canonical_name.py in /root/reference)."""

from hinbox_ray.functions import names as nv


def test_normalize_display():
    assert nv.normalize_display("  José   Padilla \n") == "José Padilla"
    # NFD input → NFC
    assert nv.normalize_display("José") == "José"


def test_normalize_for_match():
    assert nv.normalize_for_match("U.S. Army!") == "u s army"
    assert nv.normalize_for_match("Al-Qahtani") == "al qahtani"


def test_acronym_forms():
    assert nv.is_acronym_form("ICE")
    assert nv.is_acronym_form("U.N.")
    assert nv.is_acronym_form("DoD")
    assert not nv.is_acronym_form("Pentagon")
    assert not nv.is_acronym_form("X")  # too short


def test_compute_acronym():
    assert nv.compute_acronym("Immigration and Customs Enforcement") == "ICE"
    assert nv.compute_acronym("Department of Homeland Security") == "DHS"
    assert nv.compute_acronym("Federal Bureau of Investigation") == "FBI"
    assert nv.compute_acronym("Pentagon") is None


def test_acronym_matches():
    assert nv.acronym_matches("ICE", "Immigration and Customs Enforcement")
    assert nv.acronym_matches("D.H.S.", "Department of Homeland Security")
    assert not nv.acronym_matches("ICE", "Federal Bureau of Investigation")


def test_containment():
    assert nv.is_name_contained("Homeland Security", "Department of Homeland Security")
    assert not nv.is_name_contained("ICE", "Service")  # short + no word boundary
    assert not nv.is_name_contained("ami", "Miami")  # word boundary required


def test_names_likely_same_orgs():
    assert nv.names_likely_same("ICE", "Immigration and Customs Enforcement")
    assert nv.names_likely_same(
        "Homeland Security", "Department of Homeland Security"
    )
    assert not nv.names_likely_same("FBI", "Central Intelligence Agency")


def test_names_likely_same_people_conservative():
    # containment NOT applied to people
    assert not nv.names_likely_same(
        "Miller", "Geoffrey Miller", entity_type="people"
    )
    assert nv.names_likely_same("Geoffrey  Miller", "Geoffrey Miller", entity_type="people")


def test_equivalence_groups():
    groups = [["Department of Defense", "Pentagon", "DoD"]]
    assert nv.names_likely_same("Pentagon", "DoD", equivalence_groups=groups)
    got = nv.expand_equivalents("pentagon", groups)
    assert "Department of Defense" in got


def test_low_quality_names():
    assert nv.is_low_quality_name("defense departments")
    assert nv.is_low_quality_name("security agencies")
    assert nv.is_low_quality_name("military base in Guantánamo Bay")
    assert not nv.is_low_quality_name("Department of Defense")


def test_canonical_scoring_order():
    # full form > acronym; proper noun > contextual suffix
    assert nv.score_canonical_name("Immigration and Customs Enforcement") > \
        nv.score_canonical_name("ICE")
    assert nv.score_canonical_name("United States") > nv.score_canonical_name("U.S. soil")
    assert nv.score_canonical_name("Department of Defense") > \
        nv.score_canonical_name("defense departments")


def test_cluster_canonical_election_bonuses():
    cluster = ["ICE", "Immigration and Customs Enforcement"]
    full = nv.canonical_score_with_bonuses(
        "Immigration and Customs Enforcement", cluster
    )
    acro = nv.canonical_score_with_bonuses("ICE", cluster)
    assert full > acro
    # containment bonus: longer complete form wins
    cluster2 = ["Homeland Security", "Department of Homeland Security"]
    assert nv.canonical_score_with_bonuses(
        "Department of Homeland Security", cluster2
    ) > nv.canonical_score_with_bonuses("Homeland Security", cluster2)


def test_lexical_ratio_gating():
    assert nv.lexical_ratio("Guantanamo Bay", "Guantanamo Bay") == 100.0
    assert nv.lexical_ratio("Mohammed al-Qahtani", "Mohammed al-Kahtani") > 60
    assert nv.lexical_ratio("Camp Delta", "Miami") < 40


def test_variant_texts():
    got = nv.entity_variant_texts(
        "Department of Homeland Security", aliases=["DHS "], alternatives=[]
    )
    assert got[0] == "Department of Homeland Security"
    assert "DHS" in got  # alias kept, derived acronym deduped case-insensitively
    assert len([t for t in got if t.lower() == "dhs"]) == 1


def test_domain_config_from_yaml(tmp_path):
    from hinbox_ray.config import DomainConfig

    p = tmp_path / "config.yaml"
    p.write_text(
        """
domain: court
similarity_thresholds: {people: 0.9, default: 0.7}
blocking: {lexical_cutoff: 70, max_candidates: 10, unknown_key: 1}
evidence: {max_chars: 800}
equivalence_groups:
  organizations:
    - [Department of Justice, DOJ]
"""
    )
    cfg = DomainConfig.from_yaml(str(p))
    assert cfg.domain == "court"
    assert cfg.threshold("people") == 0.9
    assert cfg.threshold("events") == 0.7
    assert cfg.blocking.lexical_cutoff == 70
    assert cfg.blocking.max_candidates == 10
    assert cfg.blocking.max_block_pairs == 2000  # default kept
    assert cfg.evidence.max_chars == 800
    assert ["Department of Justice", "DOJ"] in cfg.groups_for("organizations")


def test_embeddings_compatible_predicate():
    from hinbox_ray.functions.matching import embeddings_compatible

    assert embeddings_compatible(64, "m1", 64, "m1")
    assert embeddings_compatible(64, "", 64, "m1")      # unknown model side
    assert not embeddings_compatible(64, "m1", 128, "m1")  # dim mismatch
    assert not embeddings_compatible(64, "m1", 64, "m2")   # model mismatch
