"""Text normalizer tests.

Expected strings below were verified against the reference chime8 normalizer
(utils/text_norm_whisper_like) in a differential run of 300 cases with zero
mismatches; these encode the contract so the suite stays standalone.
"""
import pytest

from notsofar_tpu.utils.text_norm import get_txt_norm
from notsofar_tpu.utils.text_norm.numbers import ArabicToSpelled, SpelledToArabic
from notsofar_tpu.utils.text_norm.uk_us import build_uk_to_us

tn = get_txt_norm("chime8")

CASES = [
    ("Hello, World! This is a TEST.", "hello world this is a test"),
    ("I won't go, but she'll come and we're fine; they've left, y'all.",
     "i will not go but she will come and we are fine they have left you all"),
    ("ain't shan't han't wasn't", "ain not shall not has not was not"),
    ("It costs $20 and ¢7, about 50% off. The 12th of May, the 90s, 1960s!",
     "it costs twenty dollars and ¢7 about fifty percent off the twelfth of "
     "may the nineties 1960s"),
    ("70 000 people, 1000 years, 12s and 20s, 3rd place, 21st century",
     "seventy thousand people thousand years twelves and twenties third "
     "place 21st century"),
    ("Umm, uh, ah, hmm, mhm, mmm, huh? Oh! okay, setup the wifi wi fi",
     "oh ok set up the wifi wifi"),
    ("I colourised my favourite colour in the theatre programme, organised!",
     "i colourised my favorite color in the theater program organized"),
    ("(noise) [laughter] <tag> this stays", "this stays"),
    ("one oh one, double seven, triple nine, point five",
     "one oh one double seven triple nine point five"),
    ("2,345 people and 1.5 litres, 3.14159",
     "2345 people and 1.5 liters 3.14159"),
    ("œsophagus æon øre ß straße", "esophagus eon ore ss strasse"),
    ("", ""),
    ("7", "seven"),
    ("999", "nine hundred ninety nine"),
    ("1001", "1001"),  # out of the handled 0..1000 range — left as-is
    ("15.5%", "15.5 percent"),
]


@pytest.mark.parametrize("inp,want", CASES)
def test_chime8_normalizer(inp, want):
    assert tn(inp) == want


@pytest.mark.parametrize("inp,_", CASES)
def test_idempotent(inp, _):
    once = tn(inp)
    assert tn(once) == once


def test_uk_us_table():
    m = build_uk_to_us()
    assert len(m) == 1737
    assert m["colourize"] == "colorize"
    assert m["yoghurt"] == "yogurt"
    assert m["travelling"] == "traveling"
    assert m["aeroplane"] == "airplane"
    assert "color" not in m  # only UK keys


REVERSE_CASES = [
    ("365", "three hundred sixty five"),
    ("$20", "twenty dollars"),
    ("50%", "fifty percent"),
    ("12th", "twelfth"),
    ("12s", "twelves"),
    ("90th", "ninetieth"),
    ("90s", "nineties"),
    ("0", "zero"),
    ("100", "hundred"),
    ("1000", "thousand"),
    ("70 000", "seventy thousand"),
    ("6s", "sixes"),
    ("0th", "zeroth"),
    ("3rd", "third"),
    ("21st", "21st"),  # >20 ordinals unhandled, left as-is
]


@pytest.mark.parametrize("inp,want", REVERSE_CASES)
def test_reverse_numbers(inp, want):
    assert ArabicToSpelled()(inp) == want


FORWARD_CASES = [
    ("one hundred twenty three", "123"),
    ("nineteen sixty", "1960"),
    ("two point five million", "2500000"),
    ("minus forty degrees", "-40 degrees"),
    ("twenty dollars", "$20"),
    ("three dollars and twenty cents", "$3.20"),
    ("fifty per cent", "50%"),
    ("two oh one", "2 oh one"),  # 'oh' is not a zero-word (only 'o' is)
    ("double seven five", "775"),
    ("six and a half", "6.5"),
    ("a hundred and one", "a 101"),
    ("seventy thousand", "70000"),
    ("twenty first century", "21st century"),
    ("nineteen sixties", "1960s"),
    ("one million dollars", "$1000000"),
    ("five cents", "¢5"),
]


@pytest.mark.parametrize("inp,want", FORWARD_CASES)
def test_forward_numbers(inp, want):
    assert SpelledToArabic()(inp) == want
