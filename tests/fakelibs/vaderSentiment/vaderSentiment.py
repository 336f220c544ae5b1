"""Test double: minimal ``SentimentIntensityAnalyzer`` with the same
``polarity_scores(text) -> {"neg","neu","pos","compound"}`` contract as
vaderSentiment 3.x. Deterministic fixed lexicon."""

import math

_POS = {"great", "awesome", "good", "love", "happy", "keep"}
_NEG = {"bad", "terrible", "awful", "hate", "sad"}


class SentimentIntensityAnalyzer:
    def polarity_scores(self, text):
        toks = (text or "").lower().split()
        n = max(len(toks), 1)
        npos = sum(t in _POS for t in toks)
        nneg = sum(t in _NEG for t in toks)
        total = npos - nneg
        compound = round(total / math.sqrt(total * total + 15.0), 4)
        return {
            "neg": round(nneg / n, 3),
            "neu": round((n - npos - nneg) / n, 3),
            "pos": round(npos / n, 3),
            "compound": compound,
        }
