"""extras/cleaning.py: global line dedup, C4 line filters, PII redaction.

Each operator also has a hard DuckDB oracle in __spark_entry__
(line_dedup / line_filter / pii_redact); these tests pin the
constructed-edge semantics the sf0.01 corpus may not exercise.
"""

from __future__ import annotations

import pytest

from datamatch_spark.extras.cleaning import (
    dedup_lines,
    filter_lines,
    redact_pii,
    remove_duplicate_spans,
)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestDedupLines:
    def test_keep_first_across_docs(self, spark):
        df = spark.createDataFrame(
            [
                (0, "alpha\nbeta\nalpha\ngamma"),
                (1, "beta\ndelta"),
                (2, "gamma"),
            ],
            ["doc_id", "text"],
        )
        out = _rows(dedup_lines(df))
        # doc 0 keeps first occurrence of each; its second 'alpha' goes
        assert out[0]["text_dedup"] == "alpha\nbeta\ngamma"
        assert (out[0]["n_lines"], out[0]["n_lines_kept"]) == (4, 3)
        # doc 1 loses 'beta' (kept at doc 0 pos 1)
        assert out[1]["text_dedup"] == "delta"
        # doc 2 loses its only line -> empty string, not NULL
        assert out[2]["text_dedup"] == ""
        assert (out[2]["n_lines"], out[2]["n_lines_kept"]) == (1, 0)

    def test_short_lines_exempt(self, spark):
        # empty lines (< dedup_min_chars) are never deduplicated
        df = spark.createDataFrame(
            [(0, "a\n\nb\n\nc"), (1, "\n")], ["doc_id", "text"]
        )
        out = _rows(dedup_lines(df))
        assert out[0]["text_dedup"] == "a\n\nb\n\nc"
        assert out[1]["text_dedup"] == "\n"
        assert out[1]["n_lines_kept"] == 2

    def test_within_doc_position_order(self, spark):
        # keeper is the (doc_id, pos)-minimal occurrence, so a line
        # repeated within one doc keeps its FIRST position
        df = spark.createDataFrame([(5, "x\ny\nx\nx")], ["doc_id", "text"])
        out = _rows(dedup_lines(df))
        assert out[5]["text_dedup"] == "x\ny"

    def test_null_text(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, "a")], ["doc_id", "text"]
        )
        out = _rows(dedup_lines(df))
        assert out[0]["text_dedup"] is None
        assert (out[0]["n_lines"], out[0]["n_lines_kept"]) == (0, 0)
        assert out[1]["text_dedup"] == "a"

    def test_custom_separator_is_literal(self, spark):
        # '.' must split literally, not as a regex wildcard
        df = spark.createDataFrame([(0, "ab.cd.ab")], ["doc_id", "text"])
        out = _rows(dedup_lines(df, sep="."))
        assert out[0]["text_dedup"] == "ab.cd"

    def test_dedup_min_chars_exempts_below(self, spark):
        df = spark.createDataFrame(
            [(0, "ab\nab\nabc\nabc")], ["doc_id", "text"]
        )
        out = _rows(dedup_lines(df, dedup_min_chars=3))
        # 'ab' (2 chars) exempt -> both copies stay; 'abc' dedups
        assert out[0]["text_dedup"] == "ab\nab\nabc"


class TestFilterLines:
    def test_min_words_and_stop_phrase(self, spark):
        df = spark.createDataFrame(
            [(0, "one two three\ntoo short\nhas the bad phrase inside\nx")],
            ["doc_id", "text"],
        )
        out = _rows(
            filter_lines(df, min_words=3, drop_if_contains=("bad phrase",))
        )
        assert out[0]["text_filtered"] == "one two three"
        assert (out[0]["n_lines"], out[0]["n_lines_kept"]) == (4, 1)

    def test_terminal_punct(self, spark):
        df = spark.createDataFrame(
            [(0, "a full sentence.\nno punct here\nis it real?")],
            ["doc_id", "text"],
        )
        out = _rows(
            filter_lines(df, min_words=2, require_terminal_punct=True)
        )
        assert out[0]["text_filtered"] == "a full sentence.\nis it real?"

    def test_null_text(self, spark):
        df = spark.createDataFrame([(0, None)], "doc_id long, text string")
        out = _rows(filter_lines(df))
        assert out[0]["text_filtered"] is None
        assert (out[0]["n_lines"], out[0]["n_lines_kept"]) == (0, 0)


class TestRedactPii:
    def test_staged_redaction_and_counts(self, spark):
        df = spark.createDataFrame(
            [
                (0, "mail a.b+c@ex-a.co and 10.0.0.1 then 555-123-4567 ok"),
                (1, "no pii at all"),
                (2, None),
            ],
            ["doc_id", "text"],
        )
        out = _rows(redact_pii(df))
        assert out[0]["text_redacted"] == (
            "mail <EMAIL> and <IP> then <PHONE> ok"
        )
        assert (
            out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]
        ) == (1, 1, 1)
        assert out[1]["text_redacted"] == "no pii at all"
        assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (
            0, 0, 0,
        )
        assert out[2]["text_redacted"] is None
        assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (
            0, 0, 0,
        )

    def test_ip_inside_email_counts_once(self, spark):
        # staged counting: the email eats its domain before the IP pass
        df = spark.createDataFrame(
            [(0, "u@10.0.0.1.net but raw 192.168.0.7 stays")],
            ["doc_id", "text"],
        )
        out = _rows(redact_pii(df))
        assert out[0]["n_emails"] == 1
        assert out[0]["n_ips"] == 1
        assert out[0]["text_redacted"] == "<EMAIL> but raw <IP> stays"

    def test_multiple_hits(self, spark):
        df = spark.createDataFrame(
            [(0, "a@b.io c@d.org 1.2.3.4 5.6.7.8 555-000-1111")],
            ["doc_id", "text"],
        )
        out = _rows(redact_pii(df))
        assert (
            out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]
        ) == (2, 2, 1)


class TestRemoveDuplicateSpans:
    def test_cross_doc_span_removed_everywhere(self, spark):
        # 'a b c' occurs in both docs -> ALL occurrences cut
        df = spark.createDataFrame(
            [(0, "x a b c y"), (1, "a b c z")], ["doc_id", "text"]
        )
        out = _rows(remove_duplicate_spans(df, n=3))
        assert out[0]["text_cut"] == "x y"
        assert out[1]["text_cut"] == "z"
        assert out[0]["n_tokens_removed"] == 3
        assert (out[1]["n_tokens"], out[1]["n_tokens_removed"]) == (4, 3)

    def test_within_doc_repeat_counts(self, spark):
        # the SAME doc repeating an n-gram reaches min_count alone
        df = spark.createDataFrame(
            [(0, "a b c q a b c")], ["doc_id", "text"]
        )
        out = _rows(remove_duplicate_spans(df, n=3))
        assert out[0]["text_cut"] == "q"

    def test_overlapping_windows_merge_coverage(self, spark):
        # 'a b c' and 'b c d' both duplicated -> union of covered
        # indices, tokens removed once each
        df = spark.createDataFrame(
            [(0, "a b c d x"), (1, "a b c d y")], ["doc_id", "text"]
        )
        out = _rows(remove_duplicate_spans(df, n=3))
        assert out[0]["text_cut"] == "x"
        assert out[0]["n_tokens_removed"] == 4

    def test_short_and_null_docs_untouched(self, spark):
        df = spark.createDataFrame(
            [(0, "a b"), (1, None), (2, "a b")],
            "doc_id long, text string",
        )
        out = _rows(remove_duplicate_spans(df, n=3))
        # 2-token docs have no 3-gram windows, even though they are
        # exact duplicates of each other
        assert out[0]["text_cut"] == "a b"
        assert out[2]["text_cut"] == "a b"
        assert out[1]["text_cut"] is None
        assert (out[1]["n_tokens"], out[1]["n_tokens_removed"]) == (0, 0)

    def test_whole_doc_removed(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "a b c")], ["doc_id", "text"]
        )
        out = _rows(remove_duplicate_spans(df, n=3))
        assert out[0]["text_cut"] == ""
        assert out[1]["text_cut"] == ""

    def test_n_must_be_at_least_two(self, spark):
        df = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            remove_duplicate_spans(df, n=1)


@pytest.mark.parametrize(
    "query",
    [
        "line_dedup",
        "line_filter",
        "pii_redact",
        "clean_pipeline",
        "dup_span_removal",
    ],
)
def test_duckdb_oracle_parity_smoke(spark, query):
    """Tiny-scale replica of the driver's oracle gate (the full one
    runs via scripts/oracle_check.py at sf0.01)."""
    duckdb = pytest.importorskip("duckdb")
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    sdf = entry.queries()[query](spark, sf_dir)
    srows = sorted(
        (tuple(r) for r in sdf.select(*sorted(sdf.columns)).collect()),
        key=key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    o = con.execute(entry.oracle_sql()[query])
    cols = [d[0] for d in o.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    orows = sorted(
        (tuple(r[i] for i in order) for r in o.fetchall()), key=key
    )
    assert sorted(sdf.columns) == sorted(cols)
    assert srows == orows
