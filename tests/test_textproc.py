"""Text preprocessing tests: phonetic mapping + segmentation."""

from rho_tts_tpu.textproc import apply_phonetic_mapping, split_text_into_segments


class TestPhoneticMapping:
    def test_empty_mapping(self):
        assert apply_phonetic_mapping("hello world", {}) == "hello world"

    def test_single_replacement(self):
        out = apply_phonetic_mapping("the exocrine gland", {"exocrine": "exo-crene"})
        assert out == "the exo-crene gland"

    def test_multiple_replacements(self):
        out = apply_phonetic_mapping("a b", {"a": "x", "b": "y"})
        assert out == "x y"


class TestSegmentation:
    def test_short_text_single_segment(self):
        segs = split_text_into_segments("Hello world", 100, force_sentence_split=False)
        assert segs == ["Hello world"]

    def test_force_sentence_split(self):
        segs = split_text_into_segments("One. Two. Three", 1000, force_sentence_split=True)
        assert segs == ["One.", "Two.", "Three"]

    def test_no_force_packs_sentences(self):
        segs = split_text_into_segments("One. Two. Three", 1000, force_sentence_split=False)
        assert segs == ["One. Two. Three"]

    def test_max_chars_respected_without_force(self):
        text = "Aaaa. Bbbb. Cccc. Dddd"
        segs = split_text_into_segments(text, 12, force_sentence_split=False)
        assert all(len(s) <= 12 for s in segs)
        assert "".join(s.replace(" ", "") for s in segs) == text.replace(" ", "")

    def test_long_sentence_word_split(self):
        text = "word " * 50  # one "sentence", 250 chars
        segs = split_text_into_segments(text.strip(), 40, force_sentence_split=False)
        assert len(segs) > 1
        assert all(len(s) <= 40 for s in segs)

    def test_oversized_single_word_hard_cut(self):
        segs = split_text_into_segments("x" * 500, 100, force_sentence_split=False)
        assert segs[0] == "x" * 100

    def test_empty_text(self):
        assert split_text_into_segments("", 100) == []
