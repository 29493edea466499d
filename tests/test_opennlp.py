"""OpenNLP-module roles: real sentence detection, pluggable
POS/lemmatizer/chunker with documented rule-based defaults."""

from lucene_ray.analysis.opennlp import (OpenNLPChunkerFilter,
                                         OpenNLPLemmatizerFilter,
                                         OpenNLPPOSFilter,
                                         detect_sentences)


def _sents(text):
    return [text[a:b] for a, b in detect_sentences(text)]


def test_sentence_detection_basic():
    assert _sents("One sentence. Another one! A third?") == \
        ["One sentence.", "Another one!", "A third?"]


def test_sentence_abbreviations_and_numbers():
    assert _sents("Dr. Smith arrived. He paid 3.50 dollars.") == \
        ["Dr. Smith arrived.", "He paid 3.50 dollars."]
    assert _sents("J. Doe wrote it. Really.") == \
        ["J. Doe wrote it.", "Really."]


def test_sentence_trailing_quotes():
    assert _sents('He said "stop." Then left.') == \
        ['He said "stop."', "Then left."]


def test_sentence_no_terminator_tail():
    assert _sents("No terminator here") == ["No terminator here"]
    assert _sents("") == []


def test_pos_filter_sentence_at_a_time():
    f = OpenNLPPOSFilter()
    tagged = f.tag_text("The dog runs. A cat sleeps quickly.")
    assert [t.sentence for t in tagged] == [0, 0, 0, 1, 1, 1, 1]
    by_term = {t.term: t.type for t in tagged}
    assert by_term["the"] == "DT" and by_term["quickly"] == "RB"


def test_pos_model_plugs_in():
    calls = []

    def model(tokens):
        calls.append(list(tokens))
        return ["X"] * len(tokens)

    tagged = OpenNLPPOSFilter(model).tag_text("One two. Three.")
    assert all(t.type == "X" for t in tagged)
    # the model saw each SENTENCE as one call (the opennlp contract)
    assert calls == [["one", "two"], ["three"]]


def test_lemmatizer_dictionary_then_model_then_passthrough():
    f = OpenNLPLemmatizerFilter({"dogs": "dog"},
                                model=lambda t: "ran" == t and "run" or None)
    assert f(["dogs", "ran", "table"]) == ["dog", "run", "table"]


def test_chunker_np_vp():
    c = OpenNLPChunkerFilter()
    chunks = c.chunk_text("The big dog was running.")
    assert [(t.term, t.type) for t in chunks] == [
        ("the", "B-NP"), ("big", "I-NP"), ("dog", "I-NP"),
        ("was", "B-VP"), ("running", "I-VP")]
