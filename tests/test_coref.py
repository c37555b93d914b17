"""KB coref kernel: pronoun gender resolution, sentence windows,
distance cutoffs, "the <type>" references
(kb_coref_linker.py:134-315 semantics — see stages/coref.py parity map)."""

from __future__ import annotations

import pytest

from elevant_ray.stages.coref import (FEMALE, MALE, NEUTRAL, UNKNOWN,
                                      is_first_person_singular, is_pronoun,
                                      kb_coref_clusters)


def cluster_map(clusters):
    return {c["entity_id"]: c["mentions"] for c in clusters}


def test_is_pronoun_caps_rules():
    assert is_pronoun("he") and is_pronoun("She") and is_pronoun("I")
    assert not is_pronoun("US") and not is_pronoun("IT")  # all-caps blocked
    assert is_pronoun("it")
    assert is_first_person_singular("I") and not is_first_person_singular("i")


def test_pronoun_resolves_to_matching_gender():
    text = "Ada wrote programs . Bob read them . She was brilliant ."
    mentions = [{"begin": 0, "end": 3, "entity_id": "Q1"},
                {"begin": 21, "end": 24, "entity_id": "Q2"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE, "Q2": MALE}))
    # "She" (offset 37) must attach to Ada (female), not the nearer Bob
    assert (37, 40) in clusters["Q1"]
    assert clusters["Q2"] == [(21, 24)]


def test_pronoun_distance_cutoff():
    filler = "x " * 150  # 300 chars > the 200-char pronoun window
    text = "Ada coded . " + filler + "She returned ."
    mentions = [{"begin": 0, "end": 3, "entity_id": "Q1"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE}))
    assert clusters["Q1"] == [(0, 3)]  # out of range -> no coref


def test_unknown_gender_pronoun_matches_any():
    text = "Ada spoke . They agreed ."
    mentions = [{"begin": 0, "end": 3, "entity_id": "Q1"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE}))
    # "they" has UNKNOWN gender -> matches Ada; but UNKNOWN-gender
    # pronouns only resolve via first-person-singular or gendered path:
    # "They" gender is UNKNOWN and not first-person -> NOT resolved
    assert clusters["Q1"] == [(0, 3)]


def test_first_person_singular_resolves():
    text = "Ada said hello . I agree ."
    mentions = [{"begin": 0, "end": 3, "entity_id": "Q1"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE}))
    assert (17, 18) in clusters["Q1"]


def test_the_type_reference():
    text = "Steinway makes pianos . The company is old ."
    mentions = [{"begin": 0, "end": 8, "entity_id": "Q5"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions,
        gender_map={"Q5": NEUTRAL},
        coref_types={"Q5": ["T1"]},
        type_qid_aliases={"T1": {"Company/Firm"}}))
    # "The company" span covers both tokens
    assert (24, 35) in clusters["Q5"]


def test_type_must_be_seen_before_reference():
    # a type word BEFORE any mention carrying that type does not fire
    text = "The company thrived . Steinway makes pianos ."
    mentions = [{"begin": 22, "end": 30, "entity_id": "Q5"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, coref_types={"Q5": ["T1"]},
        type_qid_aliases={"T1": {"company"}}))
    assert clusters["Q5"] == [(22, 30)]


def test_coref_mention_extends_cluster_chain():
    # a resolved pronoun becomes a preceding entity itself: the second
    # pronoun resolves through the first
    text = "Ada coded . She slept . She woke ."
    mentions = [{"begin": 0, "end": 3, "entity_id": "Q1"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE}))
    assert clusters["Q1"] == [(0, 3), (12, 15), (24, 27)]


def test_query_runs_and_is_deterministic(ray_session):
    import __ray_entry__ as m

    d1 = m.queries()["coref_clusters"]("/root/testdata/sf0.001").to_pandas()
    d2 = m.queries()["coref_clusters"]("/root/testdata/sf0.001").to_pandas()
    assert len(d1) > 0
    assert d1.reset_index(drop=True).equals(d2.reset_index(drop=True))
    # the synthetic type words must produce at least some coref rows
    assert (d1["kind"] == "coref").any()
    assert (d1["kind"] == "mention").any()


def test_query_dims_cover_every_synthesized_entity(ray_session):
    """Regression for the round-1 NUM_ENTITIES drift: the query's
    gender/coref-type dims were built for entities 0–39 while the page
    source synthesizes NUM_ENTITIES (97), so mentions of entities ≥ 40
    silently never participated in coreference.  The dims must track
    the source constant, and high-numbered entities must actually show
    up in the clustered output."""
    import re

    import __ray_entry__ as m
    from elevant_ray.sources.pages import NUM_ENTITIES

    assert NUM_ENTITIES > 40  # the drift scenario this test guards
    d = m.queries()["coref_clusters"]("/root/testdata/sf0.001").to_pandas()
    ents = {int(g.group(1)) for e in d["entity_id"].dropna()
            if (g := re.search(r"(\d+)$", str(e)))}
    assert ents, "no entity ids in coref output"
    assert max(ents) >= 40, (
        "entities >= 40 absent from coref clusters — dims drifted from "
        "sources/pages.NUM_ENTITIES again")


# --- direct speech (kb_coref_linker.py:50-91, :124-131, :164-178) ---


def test_direct_speech_span_detection():
    from elevant_ray.functions.prior import tokenize_with_offsets
    from elevant_ray.stages.coref import direct_speech_spans

    text = ('Ada spoke first . "I was testing the compiler yesterday" '
            'she said .\n\nNext paragraph here .')
    spans = direct_speech_spans(text, tokenize_with_offsets(text))
    assert len(spans) == 1
    s, e = spans[0]["span"]
    assert text[s] == '"' and text[e] == '"'
    # speaker candidate = last capitalized non-pronoun token before
    # the opening quote
    sb, se = spans[0]["speaker"]
    assert text[sb:se] == "Ada"


def test_direct_speech_too_short_or_no_verb_rejected():
    from elevant_ray.functions.prior import tokenize_with_offsets
    from elevant_ray.stages.coref import direct_speech_spans

    short = 'Ada said "no way" loudly .\n\nMore text .'
    assert direct_speech_spans(short, tokenize_with_offsets(short)) == []
    noverb = 'Ada said "blue green red yellow orange" .\n\nMore text .'
    assert direct_speech_spans(noverb, tokenize_with_offsets(noverb)) == []


def test_direct_speech_requires_following_paragraph_boundary():
    from elevant_ray.functions.prior import tokenize_with_offsets
    from elevant_ray.stages.coref import direct_speech_spans

    # the reference's single_paragraph condition reduces to "a \n\n
    # exists at/after the quote close"; no boundary → rejected
    no_para = 'Ada said "I was testing the compiler daily" then left .'
    assert direct_speech_spans(no_para, tokenize_with_offsets(no_para)) == []


def test_first_person_in_quote_resolves_to_speaker():
    text = ('Ada spoke first . "I was testing the compiler yesterday" '
            'she said .\n\nNext paragraph here .')
    mentions = [{"begin": 0, "end": 3, "entity_id": "Q1"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE}))
    # "I" (19) inside the quote resolves to the speaker entity Ada;
    # "she" outside resolves by gender as before
    assert (19, 20) in clusters["Q1"]
    she = text.index("she")
    assert (she, she + 3) in clusters["Q1"]


def test_first_person_no_speaker_entity_unresolved():
    # speaker candidate token ("Bob") is not inside any linked mention
    # span → the reference returns nothing for "I"
    text = ('Bob spoke first . "I was testing the compiler yesterday" '
            'he said .\n\nAda wrote more text here .')
    mentions = [{"begin": text.index("Ada"), "end": text.index("Ada") + 3,
                 "entity_id": "Q1"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE}))
    assert (19, 20) not in clusters.get("Q1", [])


def test_neutral_speaker_gender_blocks_first_person():
    # reference :170-173: speaker entity must be MALE/FEMALE
    text = ('Acme spoke first . "I was testing the compiler yesterday" '
            'it said .\n\nNext paragraph here .')
    mentions = [{"begin": 0, "end": 4, "entity_id": "Q9"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q9": NEUTRAL}))
    i_pos = text.index('"I') + 1
    assert (i_pos, i_pos + 1) not in clusters.get("Q9", [])


def test_outside_reference_skips_quoted_entities():
    # "Eve" is mentioned inside the quote; a later "she" outside the
    # quote must skip her (reference :174-178) and resolve to Ada
    text = ('Ada stood there . "Eve was testing the compiler" '
            'she said .\n\nEnd paragraph .')
    eve = text.index("Eve")
    mentions = [{"begin": 0, "end": 3, "entity_id": "Q1"},
                {"begin": eve, "end": eve + 3, "entity_id": "Q2"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE, "Q2": FEMALE}))
    she = text.index("she")
    assert (she, she + 3) in clusters["Q1"]
    assert (she, she + 3) not in clusters["Q2"]


def test_direct_speech_off_restores_old_behavior():
    text = ('Ada stood there . "Eve was testing the compiler" '
            'she said .\n\nEnd paragraph .')
    eve = text.index("Eve")
    mentions = [{"begin": 0, "end": 3, "entity_id": "Q1"},
                {"begin": eve, "end": eve + 3, "entity_id": "Q2"}]
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q1": FEMALE, "Q2": FEMALE},
        direct_speech=False))
    she = text.index("she")
    # without the direct-speech rules the most recent female (Eve) wins
    assert (she, she + 3) in clusters["Q2"]


# ---------------------------------------------------------------------------
# "problematic it" filter (kb_coref_linker.py:266-277 →
# models/dependency_graph.py:186-202, surface approximation)
# ---------------------------------------------------------------------------


def _probe_it(text):
    """Run the surface filter on the first "it"/"It" token of text."""
    from elevant_ray.functions.prior import (sentence_start_flags,
                                             tokenize_with_offsets)
    from elevant_ray.stages.coref import is_problematic_it_surface

    toks = tokenize_with_offsets(text)
    flags = sentence_start_flags(text, toks)
    for ti, (b, e) in enumerate(toks):
        if text[b:e].lower().rstrip(".,;:!?\"')") == "it":
            return is_problematic_it_surface(text, toks, ti, flags)
    raise AssertionError("no 'it' token in probe text")


def test_problematic_it_frames():
    # the reference's two drop frames: nsubj of a verb with a ccomp,
    # and anticipatory it (verb + acomp + xcomp/ccomp)
    assert _probe_it("It said that the market fell sharply today .")
    assert _probe_it("It is clear that the plan failed .")
    assert _probe_it("It seems easy to win the race .")
    assert _probe_it("It really seems that nothing changed .")
    # referential uses must survive
    assert not _probe_it("Ada parked the car . It was red and shiny .")
    assert not _probe_it("The engine stalled . It belongs to Alice .")
    assert not _probe_it("The dog barked . Bob fed it quickly .")


def test_problematic_it_not_clustered():
    text = "The rover landed . It is clear that dust covered everything ."
    mentions = [{"begin": 4, "end": 9, "entity_id": "Q5"}]
    it_pos = text.index("It")
    gm = {"Q5": NEUTRAL}
    clusters = cluster_map(kb_coref_clusters(text, mentions,
                                             gender_map=gm))
    assert (it_pos, it_pos + 2) not in clusters["Q5"]
    # parameterized off → old behavior (the "it" clusters again)
    clusters_off = cluster_map(kb_coref_clusters(
        text, mentions, gender_map=gm, problematic_it=False))
    assert (it_pos, it_pos + 2) in clusters_off["Q5"]


def test_referential_it_still_clusters():
    text = "The rover landed . It rolled forward across red dust ."
    mentions = [{"begin": 4, "end": 9, "entity_id": "Q5"}]
    it_pos = text.index("It")
    clusters = cluster_map(kb_coref_clusters(
        text, mentions, gender_map={"Q5": NEUTRAL}))
    assert (it_pos, it_pos + 2) in clusters["Q5"]


# --- paragraph-subject shortcut (kb_coref_linker.py:110-121,:280-285,
#     get_referenced_entity :160-161) ---


def test_get_paragraphs_verbatim_quirks():
    from elevant_ray.stages.coref import get_paragraphs

    # no \n\n boundary at all -> NO paragraphs (reference: match stays
    # None, nothing appended)
    assert get_paragraphs("single paragraph text .") == []
    assert get_paragraphs("") == []
    # spans: (start, match.end()), next start = match.end() + 1 (the
    # reference's off-by-one), trailing piece appended only after a hit
    assert get_paragraphs("A\n\nB\n\nC") == [(0, 3), (4, 6), (7, 7)]
    # trailing \n\n at the very end: no trailing paragraph
    assert get_paragraphs("A\n\n") == [(0, 3)]


def _para_fixture():
    text = ("Acme Corp built the Widget Tool daily .\n\n"
            "Today it was popular everywhere .")
    ments = [
        {"begin": 0, "end": 9, "entity_id": "E_acme"},
        {"begin": text.index("Widget"),
         "end": text.index("Widget") + len("Widget Tool"),
         "entity_id": "E_tool"},
    ]
    genders = {"E_acme": NEUTRAL, "E_tool": NEUTRAL}
    return text, ments, genders


def test_neutral_paragraph_subject_resolves_to_title_entity():
    """A NEUTRAL pronoun that is the subject of its paragraph's first
    sentence short-circuits to the NEUTRAL title entity (the mention at
    offset 0) even though a nearer NEUTRAL entity exists."""
    text, ments, genders = _para_fixture()
    it_span = (text.index("it"), text.index("it") + 2)
    on = cluster_map(kb_coref_clusters(text, ments, gender_map=genders))
    assert it_span in on["E_acme"]
    # parameterized off: the reversed scan picks the nearest NEUTRAL
    off = cluster_map(kb_coref_clusters(text, ments, gender_map=genders,
                                        paragraph_subject=False))
    assert it_span in off["E_tool"]


def test_paragraph_subject_requires_neutral_title():
    """MALE title entity: the :160-161 guard fails, scan proceeds."""
    text, ments, genders = _para_fixture()
    genders = dict(genders, E_acme=MALE)
    it_span = (text.index("it"), text.index("it") + 2)
    clusters = cluster_map(kb_coref_clusters(text, ments,
                                             gender_map=genders))
    assert it_span in clusters["E_tool"]


def test_paragraph_subject_requires_subject_position():
    """'it' NOT followed by a verb-like token is no nsubj surface —
    the shortcut must not fire."""
    text = ("Acme Corp built the Widget Tool daily .\n\n"
            "Today it probably not popular anywhere . It was nice .")
    ments = [{"begin": 0, "end": 9, "entity_id": "E_acme"},
             {"begin": text.index("Widget"),
              "end": text.index("Widget") + len("Widget Tool"),
              "entity_id": "E_tool"}]
    genders = {"E_acme": NEUTRAL, "E_tool": NEUTRAL}
    clusters = cluster_map(kb_coref_clusters(text, ments,
                                             gender_map=genders))
    first_it = (text.index("it"), text.index("it") + 2)
    # non-subject 'it' falls back to the scan (nearest NEUTRAL)
    assert first_it in clusters["E_tool"]
    # the second "It was" IS a subject — but sits past the paragraph's
    # first sentence, so it scans too
    second_it = (text.index("It was"), text.index("It was") + 2)
    assert second_it in clusters["E_tool"]


def test_paragraph_first_char_offbyone_quirk():
    """The reference starts each paragraph at match.end()+1, so a
    pronoun that IS the paragraph's first character belongs to no
    paragraph span and never shortcuts — replicated faithfully."""
    text = ("Acme Corp built the Widget Tool daily .\n\n"
            "It was popular everywhere .")
    ments = [{"begin": 0, "end": 9, "entity_id": "E_acme"},
             {"begin": text.index("Widget"),
              "end": text.index("Widget") + len("Widget Tool"),
              "entity_id": "E_tool"}]
    genders = {"E_acme": NEUTRAL, "E_tool": NEUTRAL}
    clusters = cluster_map(kb_coref_clusters(text, ments,
                                             gender_map=genders))
    it_span = (text.index("It"), text.index("It") + 2)
    assert it_span in clusters["E_tool"]


def test_single_paragraph_never_shortcuts():
    """No \\n\\n -> get_paragraphs is empty -> scan semantics only."""
    text = ("Acme Corp built the Widget Tool . Later it was popular .")
    ments = [{"begin": 0, "end": 9, "entity_id": "E_acme"},
             {"begin": text.index("Widget"),
              "end": text.index("Widget") + len("Widget Tool"),
              "entity_id": "E_tool"}]
    genders = {"E_acme": NEUTRAL, "E_tool": NEUTRAL}
    for flag in (True, False):
        clusters = cluster_map(kb_coref_clusters(
            text, ments, gender_map=genders, paragraph_subject=flag))
        it_span = (text.index("it"), text.index("it") + 2)
        assert it_span in clusters["E_tool"]


def test_title_entity_must_begin_at_zero():
    """A leading non-mention word means no title entity — shortcut
    cannot fire (reference :252-253 sets it only for span[0] == 0)."""
    text = ("Famous Acme Corp built the Widget Tool daily .\n\n"
            "Today it was popular everywhere .")
    ments = [{"begin": 7, "end": 16, "entity_id": "E_acme"},
             {"begin": text.index("Widget"),
              "end": text.index("Widget") + len("Widget Tool"),
              "entity_id": "E_tool"}]
    genders = {"E_acme": NEUTRAL, "E_tool": NEUTRAL}
    clusters = cluster_map(kb_coref_clusters(text, ments,
                                             gender_map=genders))
    it_span = (text.index("it"), text.index("it") + 2)
    assert it_span in clusters["E_tool"]
