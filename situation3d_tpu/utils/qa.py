"""QA text utilities.

Re-implements ``lib/qa_helper.py:73-185``: VQA-style answer normalization
(punctuation/digit/article handling), masked softmax and the gelu_new
activation.
"""
from __future__ import annotations

import re
from typing import Optional

import jax.numpy as jnp
import numpy as np

_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve": "could've",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hadnt": "hadn't", "hasnt": "hasn't", "havent": "haven't",
    "hed": "he'd", "hes": "he's", "howd": "how'd", "howll": "how'll",
    "hows": "how's", "im": "i'm", "ive": "i've", "isnt": "isn't",
    "itd": "it'd", "itll": "it'll", "lets": "let's", "maam": "ma'am",
    "mightve": "might've", "mustve": "must've", "shant": "shan't",
    "shed": "she'd", "shes": "she's", "shouldve": "should've",
    "shouldnt": "shouldn't", "somebodyd": "somebody'd",
    "somebodyll": "somebody'll", "somebodys": "somebody's",
    "someoned": "someone'd", "someonell": "someone'll", "someones": "someone's",
    "somethingd": "something'd", "somethingll": "something'll",
    "thats": "that's", "thered": "there'd", "therere": "there're",
    "theres": "there's", "theyd": "they'd", "theyll": "they'll",
    "theyre": "they're", "theyve": "they've", "twas": "'twas",
    "wasnt": "wasn't", "wed": "we'd", "weve": "we've", "werent": "weren't",
    "whatll": "what'll", "whatre": "what're", "whats": "what's",
    "whatve": "what've", "whens": "when's", "whered": "where'd",
    "wheres": "where's", "whereve": "where've", "whod": "who'd",
    "wholl": "who'll", "whos": "who's", "whove": "who've", "whyll": "why'll",
    "whyre": "why're", "whys": "why's", "wont": "won't", "wouldve": "would've",
    "wouldnt": "wouldn't", "yall": "y'all", "youd": "you'd", "youll": "you'll",
    "youre": "you're", "youve": "you've",
}
_DIGITS = {"none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
           "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
           "nine": "9", "ten": "10"}
_ARTICLES = {"a", "an", "the"}
_PERIOD_STRIP = re.compile(r"(?!<=\d)(\.)(?!\d)")
_COMMA_STRIP = re.compile(r"(\d)(,)(\d)")
_PUNCT = [";", "/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\", "_",
          "-", ">", "<", "@", "`", ",", "?", "!"]


def process_punctuation(text: str) -> str:
    out = text
    for p in _PUNCT:
        if (p + " " in text or " " + p in text) or re.search(
                _COMMA_STRIP, text) is not None:
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    return _PERIOD_STRIP.sub("", out, re.UNICODE)


def process_digit_article(text: str) -> str:
    out = []
    for word in text.lower().split():
        word = _DIGITS.get(word, word)
        if word not in _ARTICLES:
            out.append(_CONTRACTIONS.get(word, word))
    return " ".join(out)


def normalize_answer(answer: str) -> str:
    """Full VQA normalization pipeline."""
    answer = answer.replace("\n", " ").replace("\t", " ").strip()
    return process_digit_article(process_punctuation(answer))


def masked_softmax(logits: jnp.ndarray, mask: Optional[jnp.ndarray],
                   axis: int = -1) -> jnp.ndarray:
    """Softmax where masked (mask==0) positions get zero probability."""
    if mask is None:
        return jnp.exp(logits - jnp.max(logits, axis=axis, keepdims=True)) / \
            jnp.sum(jnp.exp(logits - jnp.max(logits, axis=axis, keepdims=True)),
                    axis=axis, keepdims=True)
    big_neg = jnp.finfo(logits.dtype).min / 2
    masked = jnp.where(mask.astype(bool), logits, big_neg)
    p = jnp.exp(masked - jnp.max(masked, axis=axis, keepdims=True))
    p = p * mask.astype(p.dtype)
    return p / jnp.maximum(jnp.sum(p, axis=axis, keepdims=True), 1e-13)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """The tanh-approximation GELU (qa_helper.py gelu_new)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3.0))))
