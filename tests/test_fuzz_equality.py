"""Hypothesis fuzz: engine == oracle on arbitrary span tables.

Random kinds (valid + junk), texts (unicode/empty/None), refs, duplicate
and unsorted offsets, negative pages — anything schema-valid. The Arrow
kernel and the pure-Python oracle must agree doc-for-doc, span-for-span.
"""

from hypothesis import given, settings, strategies as st

from pdfplucker_spark.gen import rows_to_table
from pdfplucker_spark.operators.extract import extract_batch_local
from pdfplucker_spark.oracle import extract_doc

KINDS = st.sampled_from(
    [
        "section_header", "formula", "reference", "list_item", "caption",
        "footnote", "title", "text", "paragraph", "page_footer",
        "checkbox_selected", "checkbox_unselected", "code",
        "table", "picture", "page_break", "blob", "widget", "", "PAGE_BREAK",
    ]
)
TEXTS = st.one_of(
    st.none(),
    st.text(max_size=12),
    st.sampled_from(["", "a:0.5", "x:y:0.25,z:1", "chart:", ":0.5", "a:nan",
                     "ação 🙂", "1_0", " 5 ", "-3", "1e3", "0.5", "café:0.9"]),
)
REFS = st.one_of(
    st.none(),
    st.sampled_from(["#/tables/0", "#/pictures/0", "#/pictures/1", "1", "2",
                     "-7", " 3 ", "4.5", "99999999999999999999", "p4", ""]),
    st.text(max_size=8),
)
OFFSETS = st.integers(min_value=-3, max_value=40)

SPAN = st.fixed_dictionaries(
    {"kind": KINDS, "text": TEXTS, "media_ref": REFS, "offset": OFFSETS}
)
DOC = st.lists(SPAN, max_size=25)


@settings(max_examples=60, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=8))
def test_engine_matches_oracle_on_arbitrary_spans(docs):
    rows = [(f"doc_{i}", spans) for i, spans in enumerate(docs)]
    out = extract_batch_local(rows_to_table(rows))
    got = {r["doc_id"]: r for r in out.to_pylist()}
    assert len(got) == len(rows)
    for doc_id, spans in rows:
        exp = extract_doc(doc_id, spans)
        g = got[doc_id]
        assert g["status"] == exp["status"], (doc_id, g["error"], exp["error"], spans)
        assert (g["error"] or None) == exp["error"], (doc_id, spans)
        assert g["spans"] == exp["spans"], (doc_id, spans)
