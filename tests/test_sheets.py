"""Sheets pillar (H1–H5) — ports the reference's behavioral assertions
(tests/unit/test_sheets.py) onto the in-memory backend."""

from __future__ import annotations

import pytest

from gcpde_spark.sheets import InMemorySheetBackend, SheetStore, WorksheetNotFound


@pytest.fixture()
def store(spark):
    return SheetStore(spark, InMemorySheetBackend())


def _seed(store: SheetStore, doc: str, name: str, values: list[list]) -> None:
    ws = store.backend.open_document(doc).add_worksheet(name, rows=100, cols=26)
    ws.update(values=values, range_name="A1")


def test_read_sheet_coerces_all_values_to_str_or_none(store):
    """Golden coercion ≙ gcpde/sheets.py:250-253, tests/unit/test_sheets.py:184-196:
    str(value), with empty string → None."""
    _seed(store, "doc", "s", [["col", "n"], ["value", 123], ["", 4.5]])
    assert store.read_sheet("doc", "s") == [
        {"col": "value", "n": "123"},
        {"col": None, "n": "4.5"},
    ]


def test_read_sheet_zero_is_kept_not_nulled(store):
    # str(0) == "0" is truthy — only the EMPTY string becomes None
    _seed(store, "doc", "s", [["n"], [0]])
    assert store.read_sheet("doc", "s") == [{"n": "0"}]


def test_read_sheet_head_selects_header_row(store):
    _seed(store, "doc", "s", [["junk", "junk2"], ["a", "b"], [1, 2]])
    assert store.read_sheet("doc", "s", head=2) == [{"a": "1", "b": "2"}]


def test_read_sheet_expected_headers_validated(store):
    _seed(store, "doc", "s", [["a", "b"], [1, 2]])
    assert store.read_sheet("doc", "s", expected_headers=["a"]) == [
        {"a": "1", "b": "2"}
    ]
    with pytest.raises(ValueError):
        store.read_sheet("doc", "s", expected_headers=["missing"])
    with pytest.raises(ValueError):
        store.read_sheet("doc", "s", expected_headers=["a", "a"])


def test_read_sheets_all_and_named(store):
    """≙ tests/unit/test_sheets.py:199-219 — ints stringified per sheet."""
    _seed(store, "doc", "s1", [["key"], [123]])
    _seed(store, "doc", "s2", [["k2"], ["x"]])
    assert store.read_sheets("doc") == {
        "s1": [{"key": "123"}],
        "s2": [{"k2": "x"}],
    }
    assert store.read_sheets("doc", sheet_names=["s2"]) == {"s2": [{"k2": "x"}]}


def test_replace_from_records_clears_and_projects_columns(store):
    """≙ gcpde/sheets.py:86-117 — header row + records projected to the
    given column order; pre-existing content cleared."""
    _seed(store, "doc", "s", [["old"], ["stale"]])
    store.replace_from_records(
        "doc", "s", [{"a": 1, "b": 2}, {"a": 3, "b": 4}], columns=["b", "a"]
    )
    ws = store.backend.open_document("doc").worksheet("s")
    assert ws.get_all_values() == [["b", "a"], [2, 1], [4, 3]]


def test_replace_from_records_missing_column_raises(store):
    _seed(store, "doc", "s", [["a"]])
    with pytest.raises(KeyError):
        store.replace_from_records("doc", "s", [{"a": 1}], columns=["a", "missing"])


def test_replace_from_records_missing_worksheet_raises(store):
    with pytest.raises(WorksheetNotFound):
        store.replace_from_records("doc", "nope", [], columns=["a"])


def test_replace_or_create_creates_with_min_rows(store):
    """Create sizing ≙ gcpde/sheets.py:149-155: rows=max(min_rows, n+1)."""
    ws = store.replace_or_create_from_records(
        "doc", "new", [{"a": i} for i in range(3)], columns=["a"], min_rows=10
    )
    assert (ws.row_count, ws.col_count) == (10, 1)
    big = store.replace_or_create_from_records(
        "doc", "big", [{"a": i} for i in range(20)], columns=["a"], min_rows=10
    )
    assert big.row_count == 21  # n+1 > min_rows


def test_replace_or_create_resize_grows_never_shrinks(store):
    """Resize ≙ gcpde/sheets.py:156-161: max(existing, min_rows, required)."""
    doc = store.backend.open_document("doc")
    doc.add_worksheet("s", rows=500, cols=5)
    ws = store.replace_or_create_from_records(
        "doc", "s", [{"a": 1}], columns=["a"], min_rows=100
    )
    assert (ws.row_count, ws.col_count) == (500, 5)  # grow-only
    assert ws.get_all_values() == [["a"], [1]]


def test_list_and_delete_worksheet(store):
    """≙ gcpde/sheets.py:172-213 — delete of a missing sheet raises."""
    _seed(store, "doc", "s1", [["a"]])
    _seed(store, "doc", "s2", [["a"]])
    assert [w.title for w in store.list_worksheets("doc")] == ["s1", "s2"]
    store.delete_worksheet("doc", "s1")
    assert [w.title for w in store.list_worksheets("doc")] == ["s2"]
    with pytest.raises(WorksheetNotFound):
        store.delete_worksheet("doc", "s1")


def test_read_sheet_df_all_string_schema_and_broadcast_joinable(store, spark):
    """The Spark boundary: worksheet → all-StringType DataFrame usable as a
    broadcast dimension (SURVEY.md §1.1 'Worksheet')."""
    from pyspark.sql import functions as F

    _seed(store, "doc", "dim", [["k", "label"], [1, "one"], [2, ""]])
    df = store.read_sheet_df("doc", "dim")
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    rows = {r.k: r.label for r in df.collect()}
    assert rows == {"1": "one", "2": None}

    facts = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    joined = facts.join(
        F.broadcast(df.withColumn("k", F.col("k").cast("int"))), on="k", how="left"
    )
    assert {(r.k, r.label) for r in joined.collect()} == {(1, "one"), (2, None)}


def test_replace_from_df_roundtrip(store, spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, name string")
    store.replace_from_df("doc", "out", df)
    assert store.read_sheet("doc", "out") == [
        {"id": "1", "name": "x"},
        {"id": "2", "name": "y"},
    ]


# -- GspreadSheetBackend contract parity ---------------------------------------
#
# gspread itself is not installed in the sandbox; the backend is exercised
# through a gspread-SHAPED fake client (same class names, same method
# surface, same exception name) so the adapter layer — auth injection,
# open_by_key, WorksheetNotFound translation — is covered, and the shared
# H1–H5 surface is asserted identical across both backends.


class _FakeGspreadWorksheetNotFound(Exception):
    pass


_FakeGspreadWorksheetNotFound.__name__ = "WorksheetNotFound"


class _FakeGspreadSpreadsheet:
    """Duck-typed gspread.Spreadsheet over an in-memory Document."""

    def __init__(self, document_id):
        from gcpde_spark.sheets import Document

        self.id = document_id
        self._doc = Document(document_id)

    def worksheet(self, name):
        from gcpde_spark.sheets import WorksheetNotFound as EngineWNF

        try:
            return self._doc.worksheet(name)
        except EngineWNF as exc:  # fake gspread raises ITS OWN exception type
            raise _FakeGspreadWorksheetNotFound(name) from exc

    def worksheets(self):
        return self._doc.worksheets()

    def add_worksheet(self, title, rows, cols):
        return self._doc.add_worksheet(title, rows, cols)

    def del_worksheet(self, ws):
        self._doc.del_worksheet(ws)


class _FakeGspreadClient:
    def __init__(self):
        self._docs = {}

    def open_by_key(self, document_id):
        if document_id not in self._docs:
            self._docs[document_id] = _FakeGspreadSpreadsheet(document_id)
        return self._docs[document_id]


@pytest.fixture()
def gspread_store(spark):
    from gcpde_spark.sheets import GspreadSheetBackend

    return SheetStore(spark, GspreadSheetBackend(client=_FakeGspreadClient()))


def test_gspread_backend_requires_credentials_or_client():
    from gcpde_spark.errors import EngineException
    from gcpde_spark.sheets import GspreadSheetBackend

    with pytest.raises(EngineException):
        GspreadSheetBackend()  # no credentials, no client, (no gspread)


def test_gspread_backend_h1_h5_parity(store, gspread_store):
    """The same H1–H5 call sequence produces identical observable state
    through InMemorySheetBackend and GspreadSheetBackend."""
    for s in (store, gspread_store):
        s.replace_or_create_from_records(
            "doc", "dim", [{"k": 1, "label": "one"}, {"k": 2, "label": ""}], ["k", "label"]
        )
        s.replace_or_create_from_records("doc", "aux", [{"a": "x"}], ["a"])
    # H1 read + coercion contract
    assert store.read_sheet("doc", "dim") == gspread_store.read_sheet("doc", "dim")
    # H2 multi-read
    assert store.read_sheets("doc") == gspread_store.read_sheets("doc")
    # H3 replace on the existing sheet
    for s in (store, gspread_store):
        s.replace_from_records("doc", "dim", [{"k": 9, "label": "nine"}], ["k", "label"])
    assert store.read_sheet("doc", "dim") == gspread_store.read_sheet("doc", "dim")
    # H5 list + delete, including the not-found translation
    assert [w.title for w in store.list_worksheets("doc")] == [
        w.title for w in gspread_store.list_worksheets("doc")
    ]
    for s in (store, gspread_store):
        s.delete_worksheet("doc", "aux")
        with pytest.raises(WorksheetNotFound):
            s.delete_worksheet("doc", "aux")
    assert [w.title for w in gspread_store.list_worksheets("doc")] == ["dim"]


def test_gspread_backend_read_df_boundary(gspread_store):
    gspread_store.replace_or_create_from_records(
        "doc", "d", [{"k": 1, "v": "a"}, {"k": 2, "v": ""}], ["k", "v"]
    )
    df = gspread_store.read_sheet_df("doc", "d")
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    assert {(r.k, r.v) for r in df.collect()} == {("1", "a"), ("2", None)}


# -- H6: credential scope-injection (≙ gcpde/sheets.py:30-52) -----------------


class _FakeScopedCreds:
    """google.auth Scoped surface: .scopes + .with_scopes(list)."""

    def __init__(self, scopes=None):
        self.scopes = scopes

    def with_scopes(self, scopes):
        return _FakeScopedCreds(list(scopes))


class _FakeUnscopableCreds:
    pass


def test_h6_unscoped_credentials_get_sheets_scopes_injected():
    from gcpde_spark.sheets import GspreadSheetBackend as B

    out = B._resolve_credentials(_FakeScopedCreds(scopes=None))
    assert out.scopes == list(B.SCOPES)
    # scoped for something else entirely → re-scoped too
    out = B._resolve_credentials(
        _FakeScopedCreds(scopes=["https://www.googleapis.com/auth/bigquery"])
    )
    assert out.scopes == list(B.SCOPES)


def test_h6_already_scoped_credentials_pass_through():
    from gcpde_spark.sheets import GspreadSheetBackend as B

    for have in B._SUFFICIENT_SCOPES:
        creds = _FakeScopedCreds(scopes=[have])
        assert B._resolve_credentials(creds) is creds


def test_h6_unscopable_credentials_warn_and_pass_through():
    import warnings as w

    from gcpde_spark.sheets import GspreadSheetBackend as B

    creds = _FakeUnscopableCreds()
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        assert B._resolve_credentials(creds) is creds
    assert any("required Google Sheets scopes" in str(c.message) for c in caught)
