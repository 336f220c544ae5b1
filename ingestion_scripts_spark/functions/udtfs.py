"""Spark 4 Python UDTFs (polymorphic table functions).

The reference's consumers hold per-key running state inside an agent
coroutine and iterate one record at a time (src/rss_consumer.py:26-169
and friends). Spark 4's UDTF-with-TABLE-argument is the declarative
equivalent of that shape: ``f(TABLE(...) PARTITION BY k ORDER BY ts)``
lets the engine shuffle-by-key and sort, while the UDTF instance holds
only ONE partition key's running state — exactly the per-key agent
loop, but parallel across 1000 executors and spill-safe.

Used where the session law is easier to state imperatively than as a
window cascade; the window-based ``q_sessionize`` twin (same oracle)
stays the default — UDTFs cross the JVM↔Python boundary per row, so at
100 TB prefer the window form and reserve the UDTF for logic windows
can't express.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

#: 30-minute session gap, microseconds (same law as q_sessionize).
SESSION_GAP_US = 30 * 60 * 1_000_000


@udtf(
    returnType=(
        "user_id bigint, session_id bigint, session_start string, "
        "session_end string, n_events bigint"
    )
)
class SessionizeUDTF:
    """Gap-based sessionizer over TABLE(events) PARTITION BY user_id
    ORDER BY ts, event_id.

    A fresh instance is created per partition key; ``eval`` sees the
    rows in ORDER BY order, closes a session when the gap to the
    previous event exceeds 30 min, and ``terminate`` flushes the last
    open session. Emits the identical shape (and law) as
    ``SQL_SESSIONIZE`` so the two sessionizers share one oracle.
    """

    _FMT = "%Y-%m-%d %H:%M:%S.%f"

    def __init__(self) -> None:
        self._user = None
        self._sid = 0
        self._start = None
        self._end = None
        self._prev_us = None
        self._n = 0

    @staticmethod
    def _us(dt) -> int:
        import calendar

        return calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond

    def _flush(self):
        return (
            self._user,
            self._sid,
            self._start.strftime(self._FMT),
            self._end.strftime(self._FMT),
            self._n,
        )

    def eval(self, row):
        us = self._us(row["ts"])
        if self._start is None:
            self._user = row["user_id"]
            self._start = self._end = row["ts"]
            self._n = 1
        elif us - self._prev_us > SESSION_GAP_US:
            yield self._flush()
            self._sid += 1
            self._start = self._end = row["ts"]
            self._n = 1
        else:
            self._end = row["ts"]
            self._n += 1
        self._prev_us = us

    def terminate(self):
        if self._start is not None:
            yield self._flush()


def make_ngrams_udtf():
    """Polymorphic n-gram UDTF: output SCHEMA depends on the `n` argument
    (``analyze()`` — the Spark 4 dynamic-schema table function contract).
    ``ngrams_udtf(text, 3)`` yields rows (w0, w1, w2); the token law is the
    house whitespace law (split on single space, drop empties) so the
    DuckDB oracle reproduces rows exactly. Built lazily so importing this
    module doesn't require an active session."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGramsUDTF:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(int(n.value)):
                st = st.add(f"w{i}", "string")
            return AnalyzeResult(schema=st)

        def eval(self, text, n):
            if text is None:
                return
            toks = [t for t in text.split(" ") if t != ""]
            for i in range(len(toks) - int(n) + 1):
                yield tuple(toks[i : i + int(n)])

    return NGramsUDTF
