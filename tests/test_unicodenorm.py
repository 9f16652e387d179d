"""Unicode normalization pass (functions/unicodenorm.py)."""

import pytest
from pyspark.sql import functions as F

from parsel_spark.functions.unicodenorm import nfc, nfkc, normalize_text


class TestNormalizeText:
    def test_nfc_composes_and_reports(self, spark) -> None:
        rows = [(1, "café"), (2, "café"), (3, None)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in normalize_text(docs).collect()}
        assert got[1]["text"] == "café" and got[1]["changed"]
        assert got[1]["len_before"] == 5 and got[1]["len_after"] == 4
        assert got[2]["text"] == "café" and not got[2]["changed"]
        assert got[3]["text"] is None and got[3]["changed"] is None

    def test_nfkc_folds_compatibility_chars(self, spark) -> None:
        # fullwidth A + ligature fi fold only under NFKC
        rows = [(1, "Ａ ﬁn")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        nfc_text = normalize_text(docs, form="NFC").first()["text"]
        nfkc_text = normalize_text(docs, form="NFKC").first()["text"]
        assert nfc_text == "Ａ ﬁn"
        assert nfkc_text == "A fin"

    def test_column_helpers(self, spark) -> None:
        row = (
            spark.createDataFrame([("é", "ﬁ")], "a string, b string")
            .select(nfc("a").alias("a"), nfkc("b").alias("b"))
            .first()
        )
        assert row["a"] == "é" and row["b"] == "fi"

    def test_bad_form_raises(self, spark) -> None:
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            normalize_text(docs, form="NFX")

    def test_passthrough_columns_survive(self, spark) -> None:
        docs = spark.createDataFrame(
            [(1, "s1", "é")], "doc_id long, source string, text string"
        )
        row = normalize_text(docs).first()
        assert row["source"] == "s1" and row["text"] == "é"
