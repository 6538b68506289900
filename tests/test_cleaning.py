"""Unit tests for operators/cleaning.py — C4 line filtering and corpus
paragraph dedup — on handcrafted documents where every rule's outcome is
known by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_data_pipeline_spark.operators.cleaning import (
    build_paragraph_index,
    c4_line_filter,
    paragraph_dedup,
    paragraph_dedup_against_index,
)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestC4LineFilter:
    def test_line_and_doc_rules(self, spark):
        docs = spark.createDataFrame(
            [
                # doc 1: 4 lines — one no-punct (drop), one short (drop),
                # one javascript (drop), three good → survives with 3
                (1, "one two three four five six.\n"
                    "this line has no terminal punctuation\n"
                    "short line.\n"
                    "please enable javascript to continue browsing.\n"
                    "a second proper sentence with enough words!\n"
                    'a third "quoted" sentence of six words?'),
                # doc 2: only 2 good sentences → dropped by min_sentences
                (2, "one two three four five six.\n"
                    "seven eight nine ten eleven twelve."),
                # doc 3: lorem ipsum marker → dropped despite good lines
                (3, "one two three four five six.\n"
                    "seven eight nine ten eleven twelve.\n"
                    "lorem ipsum dolor sit amet consectetur adipiscing."),
                # doc 4: curly brace marker → dropped
                (4, "one two three four five six.\n"
                    "seven eight nine ten eleven twelve.\n"
                    "function f() { return the result of it. }\n"
                    "thirteen fourteen fifteen sixteen seventeen eighteen."),
                # doc 5: NULL text → dropped (0 sentences)
                (5, None),
            ],
            "doc_id int, text string",
        )
        out = _rows(c4_line_filter(docs))
        assert set(out) == {1}
        r = out[1]
        assert r["n_lines"] == 6
        assert r["n_kept_lines"] == 3
        assert r["n_sentences"] == 3
        assert r["clean_text"].splitlines() == [
            "one two three four five six.",
            "a second proper sentence with enough words!",
            'a third "quoted" sentence of six words?',
        ]

    def test_word_floor_boundary(self, spark):
        docs = spark.createDataFrame(
            [(1, "one two three four five.\n"
                 "one two three four.\n"
                 "a b c d e!\n"
                 "w x y z q.")],
            "doc_id int, text string",
        )
        out = _rows(c4_line_filter(docs))
        # exactly-5-word lines pass (>=), 4-word lines fail
        assert out[1]["n_kept_lines"] == 3
        assert "one two three four." not in out[1]["clean_text"]

    def test_min_sentences_param(self, spark):
        docs = spark.createDataFrame(
            [(1, "one two three four five six.")], "doc_id int, text string"
        )
        assert c4_line_filter(docs, min_sentences=1).count() == 1
        assert c4_line_filter(docs, min_sentences=2).count() == 0


class TestParagraphDedup:
    def test_cross_doc_first_occurrence_wins(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "alpha beta\n\ngamma delta"),
                (2, "gamma delta\n\nepsilon zeta"),  # first para is a repeat
                (3, "alpha beta\n\ngamma delta"),    # loses everything
            ],
            "doc_id int, text string",
        )
        out = _rows(paragraph_dedup(docs))
        assert out[1] == {
            "doc_id": 1, "n_paragraphs": 2, "n_kept": 2,
            "clean_text": "alpha beta\n\ngamma delta",
        }
        assert out[2]["n_kept"] == 1
        assert out[2]["clean_text"] == "epsilon zeta"
        # a fully-duplicated doc survives as a row with empty text
        assert out[3] == {
            "doc_id": 3, "n_paragraphs": 2, "n_kept": 0, "clean_text": "",
        }

    def test_within_doc_repeat_keeps_first_position(self, spark):
        docs = spark.createDataFrame(
            [(7, "same para\n\nother para\n\nsame para")],
            "doc_id int, text string",
        )
        out = _rows(paragraph_dedup(docs))
        assert out[7]["n_kept"] == 2
        assert out[7]["clean_text"] == "same para\n\nother para"

    def test_sep_is_literal_not_regex(self, spark):
        # "||" would be a pathological regex; \Q..\E quoting must make it
        # a literal separator
        docs = spark.createDataFrame(
            [(1, "a b||c d"), (2, "c d||e f")], "doc_id int, text string"
        )
        out = _rows(paragraph_dedup(docs, sep="||"))
        assert out[1]["clean_text"] == "a b||c d"
        assert out[2]["clean_text"] == "e f"

    def test_deterministic_under_repartition(self, spark):
        docs = spark.createDataFrame(
            [(i, f"p{i % 5}\n\nq{i % 3}\n\nr{i}") for i in range(40)],
            "doc_id int, text string",
        )
        a = paragraph_dedup(docs).sort("doc_id").collect()
        b = paragraph_dedup(docs.repartition(13)).sort("doc_id").collect()
        assert a == b
        # first occurrence of p0 is doc 0; every later p0 is removed
        by_id = {r["doc_id"]: r for r in a}
        assert by_id[0]["n_kept"] == 3
        assert "p0" not in by_id[5]["clean_text"]

    def test_null_and_empty_text(self, spark):
        docs = spark.createDataFrame(
            [(1, None), (2, "")], "doc_id int, text string"
        )
        out = _rows(paragraph_dedup(docs))
        # NULL canonicalizes to '' — both docs yield the same single empty
        # paragraph; doc 1 wins it
        assert out[1]["n_kept"] == 1 and out[2]["n_kept"] == 0
        assert out[1]["n_paragraphs"] == 1


class TestParagraphDedupAgainstIndex:
    def test_incremental_matches_batch_union(self, spark):
        """The incremental law: cleaning batch B against index(H) keeps
        exactly the B-paragraphs that paragraph_dedup over H ∪ B keeps
        (index paragraphs always precede batch paragraphs in the
        first-occurrence order because H's doc ids are all smaller)."""
        hist = spark.createDataFrame(
            [(i, f"h{i % 4}\n\nshared {i % 2}") for i in range(10)],
            "doc_id int, text string",
        )
        batch = spark.createDataFrame(
            [(100, "shared 0\n\nfresh one"), (101, "fresh one\n\nfresh two")],
            "doc_id int, text string",
        )
        idx = build_paragraph_index(hist)
        cleaned, new_entries = paragraph_dedup_against_index(batch, idx)
        out = _rows(cleaned)
        union = {
            r["doc_id"]: r.asDict()
            for r in paragraph_dedup(hist.unionByName(batch)).collect()
            if r["doc_id"] >= 100
        }
        assert out == union
        assert out[100]["clean_text"] == "fresh one"
        assert out[101]["clean_text"] == "fresh two"
        # new index entries = the surviving paragraphs, one fp each
        assert new_entries.count() == 2

    def test_fully_seen_batch_doc_survives_empty(self, spark):
        hist = spark.createDataFrame(
            [(1, "a b\n\nc d")], "doc_id int, text string"
        )
        batch = spark.createDataFrame(
            [(2, "c d\n\na b")], "doc_id int, text string"
        )
        cleaned, new_entries = paragraph_dedup_against_index(
            batch, build_paragraph_index(hist)
        )
        out = _rows(cleaned)
        assert out[2] == {
            "doc_id": 2, "n_paragraphs": 2, "n_kept": 0, "clean_text": "",
        }
        assert new_entries.count() == 0

    def test_empty_index(self, spark):
        batch = spark.createDataFrame(
            [(1, "a b\n\na b")], "doc_id int, text string"
        )
        idx = build_paragraph_index(batch.limit(0))
        cleaned, new_entries = paragraph_dedup_against_index(batch, idx)
        out = _rows(cleaned)
        # degenerates to within-batch dedup
        assert out[1]["n_kept"] == 1 and out[1]["clean_text"] == "a b"
        assert new_entries.count() == 1


class TestC4BlocklistFilter:
    """Rule-isolation tests for the page-level blocklist (VERDICT r10
    #6): whole-word matching, case-insensitivity, NULL text, the
    passthrough contract, and per-word audit counts."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "a clean page about spark joins and windows."),
                # whole-word: 'class' must NOT trigger blocklisted 'ass'
                (2, "the class hierarchy is documented here."),
                # case-insensitive hit
                (3, "BADWORD appears loudly in this page."),
                # hit embedded in punctuation still a word hit
                (4, "ends with badword."),
                # substring of a longer word is NOT a hit
                (5, "notbadwordhere is one token and survives."),
                # multiple distinct hits on one page -> dropped once,
                # audited once per word
                (6, "badword and ass together."),
                (7, None),
            ],
            "doc_id long, text string",
        )

    def test_whole_word_case_insensitive_drop(self, spark):
        from ehr_data_pipeline_spark.operators.cleaning import (
            c4_blocklist_filter,
        )

        out = _rows(c4_blocklist_filter(self._docs(spark), ("badword", "ass")))
        assert set(out) == {1, 2, 5, 7}
        # passthrough: original columns intact, n_words appended
        assert out[2]["text"] == "the class hierarchy is documented here."
        assert out[7]["text"] is None and out[7]["n_words"] == 0
        assert out[1]["n_words"] == 8  # distinct words, '' excluded

    def test_audit_counts_per_rule(self, spark):
        from ehr_data_pipeline_spark.operators.cleaning import (
            c4_blocklist_audit,
        )

        rows = {
            r["word"]: r.asDict()
            for r in c4_blocklist_audit(
                self._docs(spark), ("badword", "ass", "unseen")
            ).collect()
        }
        assert set(rows) == {"badword", "ass", "unseen"}
        assert rows["badword"]["n_pages"] == 3  # docs 3, 4, 6
        assert rows["ass"]["n_pages"] == 1      # doc 6 only (not 'class')
        assert rows["unseen"]["n_pages"] == 0   # configured rule, no hits
        # docs 3, 4, 6 dropped — doc 6 counted once despite two hits
        assert all(r["n_pages_dropped"] == 3 for r in rows.values())

    def test_blocklist_uppercase_config_normalized(self, spark):
        from ehr_data_pipeline_spark.operators.cleaning import (
            c4_blocklist_filter,
        )

        out = _rows(c4_blocklist_filter(self._docs(spark), ("BadWord",)))
        assert set(out) == {1, 2, 5, 7}  # config word lowercased first
