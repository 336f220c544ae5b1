"""API-faithful TEST DOUBLE for the ``vaderSentiment`` package — NOT the
real library (pip install is unavailable in this sandbox). Exists solely so
``functions/sentiment.py::make_sentiment_udf``'s lib-gated pandas_udf
branch executes end-to-end (driver-side factory import + worker-side class
resolution through addPyFile). Scores are a tiny fixed lexicon, not VADER's.
"""
