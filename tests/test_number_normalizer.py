"""Inverse-text-normalization tests (capability parity with the reference's
NeMo+text_to_num pipeline, implemented dependency-free)."""

import pytest

from rho_tts_tpu.validation.stt.number_normalizer import (
    normalize_numbers_for_comparison,
    normalize_numbers_to_digits,
)


class TestDigitForms:
    def test_digit_commas_stripped(self):
        assert normalize_numbers_to_digits("costs 1,500 dollars") == "costs 1500 dollars"

    def test_million_commas(self):
        assert "1000000" in normalize_numbers_to_digits("about 1,000,000 users")

    def test_currency_symbol_stripped(self):
        assert normalize_numbers_to_digits("pay $500 now") == "pay 500 now"

    def test_plain_digits_untouched(self):
        assert normalize_numbers_to_digits("route 66 is long") == "route 66 is long"


class TestMixedFormats:
    def test_digit_plus_magnitude(self):
        assert normalize_numbers_to_digits("2 hundred") == "200"
        assert normalize_numbers_to_digits("3 thousand") == "3000"
        assert normalize_numbers_to_digits("5 million") == "5000000"


class TestWordNumbers:
    @pytest.mark.parametrize(
        "spoken,expected",
        [
            ("five", "5"),
            ("twenty", "20"),
            ("twenty-two", "22"),
            ("twenty two", "22"),
            ("one hundred", "100"),
            ("two hundred and five", "205"),
            ("three thousand", "3000"),
            ("one thousand two hundred and thirty four", "1234"),
            ("seven million", "7000000"),
        ],
    )
    def test_cardinals(self, spoken, expected):
        assert normalize_numbers_to_digits(spoken) == expected

    def test_in_sentence(self):
        out = normalize_numbers_to_digits("I have twenty two apples and five pears")
        assert "22" in out and "5" in out

    def test_year_style(self):
        assert normalize_numbers_to_digits("nineteen eighty four") == "1984"
        assert normalize_numbers_to_digits("twenty twenty five") == "2025"

    def test_non_number_words_untouched(self):
        out = normalize_numbers_to_digits("the quick brown fox")
        assert out == "the quick brown fox"


class TestOrdinals:
    @pytest.mark.parametrize(
        "spoken,expected",
        [
            ("first", "1"),
            ("third", "3"),
            ("twenty-second", "22"),
            ("fifteenth", "15"),
        ],
    )
    def test_ordinal_words(self, spoken, expected):
        assert normalize_numbers_to_digits(spoken) == expected

    def test_ordinal_suffix_stripped(self):
        assert normalize_numbers_to_digits("the 22nd of May") == "the 22 of May"
        assert normalize_numbers_to_digits("3rd place") == "3 place"


class TestTimes:
    def test_oclock(self):
        assert normalize_numbers_to_digits("five o'clock") == "5:00"

    def test_time_pair_after_preposition(self):
        assert normalize_numbers_to_digits("meet at five thirty") == "meet at 5:30"


class TestCleanup:
    def test_a_before_number(self):
        assert normalize_numbers_to_digits("a hundred people") == "100 people"


class TestComparison:
    def test_both_sides_converge(self):
        a, b = normalize_numbers_for_comparison(
            "The meeting is on the twenty-second at five o'clock",
            "the meeting is on the 22nd at 5:00",
        )
        assert "22" in a and "22" in b
        assert "5:00" in a and "5:00" in b

    def test_currency_comparison(self):
        a, b = normalize_numbers_for_comparison("it costs $1,500", "it costs fifteen hundred")
        assert a == "it costs 1500"
        assert b == "it costs 1500"
