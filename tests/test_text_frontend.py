"""Text frontend: golden number-words tests + encoding parity with the
reference TextProcessing orchestration (the reference runs with our
number/transliteration engines injected, so regex/cleaner/G2P/symbol logic
is compared end to end)."""

import pytest

from tests.ref_utils import install_reference

install_reference()

from tts_text_processing.text_processing import (  # noqa: E402
    TextProcessing as RefTextProcessing)

from radtts_tpu.text.numwords import number_to_words, ordinal_words  # noqa
from radtts_tpu.text.processing import TextProcessing  # noqa: E402

REF_DIR = "/root/reference/tts_text_processing"
OUR_ASSETS = "radtts_tpu/text/assets"


@pytest.mark.parametrize("n,expected", [
    (0, "zero"),
    (7, "seven"),
    (15, "fifteen"),
    (23, "twenty-three"),
    (100, "one hundred"),
    (105, "one hundred and five"),
    (123, "one hundred and twenty-three"),
    (1000, "one thousand"),
    (1234, "one thousand, two hundred and thirty-four"),
    (1000000, "one million"),
    (2500000, "two million, five hundred thousand"),
])
def test_number_words_golden(n, expected):
    assert number_to_words(n) == expected


@pytest.mark.parametrize("s,expected", [
    ("1st", "first"),
    ("2nd", "second"),
    ("3rd", "third"),
    ("4th", "fourth"),
    ("12th", "twelfth"),
    ("21st", "twenty-first"),
    ("30th", "thirtieth"),
    ("100th", "one hundredth"),
])
def test_ordinals_golden(s, expected):
    assert number_to_words(s) == expected


def test_group2_and_decimal():
    assert number_to_words(1915, group=2) == "nineteen, fifteen"
    assert number_to_words(2015, zero="oh", group=2) == "twenty, fifteen"
    assert number_to_words(1905, zero="oh", group=2) == "nineteen, oh five"
    assert number_to_words("1.5") == "one point five"
    assert number_to_words("3.14") == "three point one four"


SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "It is well known that deep generative models have a rich latent space.",
    "We are the first generation to feel the effects of "
    "{K L AY1 M AH0 T} change and the last generation who can do something "
    "about it!",
    "Dr. Smith paid $2,500 for 3 books on Jan 5th at 10:30 am.",
    "The LJS dataset has 13,100 clips, about 24 hours total.",
    "In 1984 there were 2 cats and 1900 dogs at No. 7 Main St.",
    "Mr. Jones met Mrs. Brown in the year 2005.",
    "A 4x4 grid costs £15 while 50% off saves $7.25!",
]


@pytest.fixture(scope="module")
def processors():
    kwargs = dict(p_phoneme=1.0, handle_phoneme="word",
                  handle_phoneme_ambiguous="ignore",
                  prepend_space_to_text=True, append_space_to_text=True,
                  add_bos_eos_to_text=False)
    ref = RefTextProcessing(
        "radtts", ["radtts_cleaners"], f"{REF_DIR}/heteronyms",
        f"{REF_DIR}/cmudict-0.7b", **kwargs)
    ours = TextProcessing(
        "radtts", ["radtts_cleaners"], f"{OUR_ASSETS}/heteronyms",
        f"{OUR_ASSETS}/cmudict-0.7b", **kwargs)
    return ref, ours


def test_symbols_match(processors):
    ref, ours = processors
    assert ours.symbols == ref.symbols
    assert len(ours.symbols) == 185


@pytest.mark.parametrize("idx", range(len(SENTENCES)))
def test_encode_parity(processors, idx):
    ref, ours = processors
    text = SENTENCES[idx]
    ref_ids, ref_clean, ref_phon = ref.encode_text(text, return_all=True)
    our_ids, our_clean, our_phon = ours.encode_text(text, return_all=True)
    assert our_clean == ref_clean
    assert our_phon == ref_phon
    assert our_ids == ref_ids


def test_long_text_chunking():
    """Sentence-boundary chunking for --long_text_chunk: every chunk fits
    the token budget, text is preserved (modulo inter-sentence spaces),
    and short inputs pass through untouched."""
    from radtts_tpu.text.chunking import split_sentences, split_text_to_chunks

    encode_len = len  # character-count proxy keeps the test hermetic

    assert split_sentences("One. Two! Three?") == ["One.", "Two!", "Three?"]
    assert split_text_to_chunks("short line.", encode_len, 100) == [
        "short line."]

    text = ("The first sentence is here. The second one follows! "
            "A third, with a question? And a fourth to finish; "
            "plus a trailing clause without punctuation")
    chunks = split_text_to_chunks(text, encode_len, 60)
    assert len(chunks) > 1
    assert all(encode_len(c) <= 60 for c in chunks)
    assert " ".join(chunks) == text

    # single sentence over budget falls back to word packing
    long_sentence = " ".join(["word"] * 40) + "."
    chunks = split_text_to_chunks(long_sentence, encode_len, 50)
    assert all(encode_len(c) <= 50 for c in chunks)
    assert " ".join(chunks) == long_sentence

    # mid-token punctuation ('12:30', '3.14', URLs) is NOT a boundary and
    # must never drop text (regression: the old match-the-pieces regex
    # returned ['30 tomorrow.'] for the first of these)
    assert split_sentences("Meet at 12:30 tomorrow.") == [
        "Meet at 12:30 tomorrow."]
    assert split_sentences("Pi is 3.14 exactly. Then more.") == [
        "Pi is 3.14 exactly.", "Then more."]
    assert split_sentences("See example.com for details") == [
        "See example.com for details"]
    text = "Meet at 12:30. Pi is 3.14 and e is 2.71! See example.com now."
    chunks = split_text_to_chunks(text, encode_len, 30)
    assert " ".join(chunks) == text
    assert all(encode_len(c) <= 30 for c in chunks)

    # a single word over the whole budget is character-split, keeping the
    # <= max_tokens contract (the frame budget downstream depends on it)
    url = "https://example.com/" + "a" * 60
    chunks = split_text_to_chunks("Read " + url + " now.", encode_len, 24)
    assert all(encode_len(c) <= 24 for c in chunks)
    assert "".join(chunks).replace(" ", "") == ("Read " + url
                                                + " now.").replace(" ", "")
