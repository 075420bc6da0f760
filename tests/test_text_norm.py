"""Whisper-normalizer parity: first-party vs the transformers-bundled
oracle (the same code the reference invokes through
``tokenizer.normalize``, reference ``downstream/metrics/dwer.py:96``)."""

import random
import string

import pytest

transformers = pytest.importorskip("transformers")

from transformers.models.whisper.english_normalizer import (  # noqa: E402
    BasicTextNormalizer as HFBasic,
    EnglishTextNormalizer as HFEnglish,
)

from audiocodecs_tpu.downstream.metrics.text_norm import (  # noqa: E402
    BasicTextNormalizer,
    EnglishTextNormalizer,
)

SENTENCES = [
    "Hello, World! (aside) [noise] café",
    "Mr. Smith won't pay twenty-one dollars and 50 cents, he said at 3 o'clock.",
    "It's one hundred and twenty-three point five percent",
    "she's gonna I'm won't can't o'clock 1970s 1st 2nd",
    "first second third twenty-first hundredth",
    "one two three", "twenty one", "one hundred", "a hundred",
    "three and a half", "nineteen seventy", "five percent", "ten dollars",
    "five pounds", "one point five", "two thousand and five", "minus five",
    "five million", "one half", "two halves", "a quarter", "three quarters",
    "one thousand two hundred thirty four", "seven eight nine",
    "twenty twenty two", "o nine", "double seven", "one oh one",
    "ninety-nine", "one hundred and one dalmatians", "the 1st of may",
    "he got 2nd place", "3rd time's the charm", "one million dollars",
    "fifty cents", "a dollar", "one dollar and five cents",
    "two point seven one eight", "thirteen", "zero", "a million",
    "twelve hundred", "five thirty", "four score", "dozen eggs",
    "no numbers here at all", "i have none", "one", "ones and zeros",
    "point one", "five one", "one and a half", "a half", "and a half",
    "one hundred fifty", "hundred", "thousand", "one thousand",
    "five hundredths", "two thirds", "one third", "half a dozen",
    "point five", "five point", "nought point five",
    "twenty dollars and ninety nine cents", "three dollars and one cent",
    "one percent", "per cent", "five per cent", "ten per cent of that",
    "1970s", "the 90s", "90's", "ninety's", "nineteen hundreds",
    "twelfth night", "seventh", "billionth", "two hundredth",
    "plus five", "positive five", "one km", "5 km", "no 1 fan",
    "number one", "double o seven", "triple seven", "o o seven",
    "five thousand and", "and", "and one", "one and two",
    "mr. smith", "mrs. jones", "dr. who", "st. mary", "jr.", "capt. kirk",
    "won't you", "cannot", "shan't", "y'all", "gimme", "lemme", "gotta",
    "it's 5 o'clock", "rock 'n' roll", "don't",
    "hmm let me think um about uh that mm",
    "he said “quote” and 3.14 and 1,234,567 items",
    "she'd been there, he's got it, they'd gone home",
    "i'ma do it, imma try, woulda coulda shoulda ma'am",
    "the prof and the rev met the hon sen and the lt col",
    "minus three point one four one five nine",
    "$5 and 10 euros and £3 and ¢7",
    "a 100 and a 1000 and 1 000 000",
    "fifty-seven thousand three hundred and twelve",
    "eighteen sixty-five to nineteen oh three",
    "sixties seventies eighties nineties",
    "sixth sixths sixes sixteenth sixtieth",
    "naïve façade über señor",
    "THE QUICK BROWN FOX!!! ??? ...",
    "1st 2nd 3rd 4th 21st 102nd 1000000th",
    "one one one", "two two", "oh oh oh", "zero zero seven",
    "double trouble", "triple a", "point blank", "and and and",
    "per capita", "percent of nothing", "cents of it",
    "euros euros", "a pound of flesh", "dollars to donuts",
]

NUM_WORDS = (
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen nineteen twenty thirty ninety hundred thousand million "
    "billion o oh zero and point double triple minus plus per cent "
    "percent dollars cents pounds euros first second third fifth twelfth "
    "twentieth hundredth thousandth ones twos sixes twenties hundreds "
    "thousands 5 42 3.14 0 1000 cat dog the a").split()


def test_english_battery():
    ours, hf = EnglishTextNormalizer(), HFEnglish({})
    for s in SENTENCES:
        assert ours(s) == hf(s), s


def test_english_fuzz_number_grammar():
    ours, hf = EnglishTextNormalizer(), HFEnglish({})
    rng = random.Random(0)
    for _ in range(400):
        s = " ".join(rng.choice(NUM_WORDS)
                     for _ in range(rng.randint(1, 12)))
        assert ours(s) == hf(s), s


def test_basic_battery():
    for kwargs in ({}, {"remove_diacritics": True},
                   {"remove_diacritics": True, "split_letters": True}):
        ours, hf = BasicTextNormalizer(**kwargs), HFBasic(**kwargs)
        for s in SENTENCES:
            assert ours(s) == hf(s), (kwargs, s)


def test_basic_fuzz_unicode():
    ours, hf = BasicTextNormalizer(), HFBasic()
    rng = random.Random(1)
    pool = string.printable + "éüñßøæœłđðþ“”‘’—–…¿¡«»äöÅçšž"
    for _ in range(200):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(1, 60)))
        assert ours(s) == hf(s), repr(s)


def test_spelling_mapping():
    ours = EnglishTextNormalizer({"colour": "color", "metre": "meter"})
    hf = HFEnglish({"colour": "color", "metre": "meter"})
    s = "the colour of the metre stick"
    assert ours(s) == hf(s) == "the color of the meter stick"
