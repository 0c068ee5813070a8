"""Empty-source contract (r7 audit): a filtered-out partition or an
empty delta must not crash a job with a numpy traceback.

Two sanctioned behaviors:

* Most entries return a well-defined (usually empty) result.
* Index BUILDERS (PQ codebook, IVF coarse quantizer, PCA covariance)
  raise a documented ValueError naming the precondition — an index
  over nothing is undefined, and a clear error beats a silent empty
  index.

The audit that produced this contract ran every batch entry against a
schema-preserving 0-row copy of the testdata: 349/361 graceful, 12
documented raises (all in the two classes pinned below).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

# representative graceful set: one per family (relational, events,
# pipeline, text, dedup, similarity search path, multimodal, eval)
GRACEFUL = [
    "q1_pricing_summary",
    "events_hourly",
    "events_sessionize",
    "events_markov_stationary",  # guarded driver fold (was 1/k crash)
    "pipeline_e2e",
    "doc_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",  # guarded query collect (was vstack crash)
    "semantic_search",
    "emb_dedup_incremental",  # guarded batch collect
    "search_rrf",
    "multimodal_decode",
    "corpus_select_e2e",
]

# documented index-undefined raises: builder -> message fragment
RAISERS = {
    "knn_pq": "PQ codebook undefined",
    "emb_pq_export": "PQ codebook undefined",
    "knn_ivf": "IVF coarse quantizer undefined",
    "emb_ivf_export": "IVF coarse quantizer undefined",
    "knn_ivf_trained": "IVF coarse quantizer undefined",
    "emb_pca_project": "undefined on an empty input",
    "emb_pca_check": "undefined on an empty input",
}


@pytest.fixture(scope="module")
def sf0_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf0")
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(src, f))
            pq.write_table(schema.empty_table(), str(dst / f))
    return str(dst)


@pytest.mark.parametrize("key", GRACEFUL)
def test_entry_survives_empty_sources(spark, sf0_dir, key):
    df = QUERIES[key](spark, sf0_dir)
    assert df.count() >= 0  # defined result, no crash


@pytest.mark.parametrize("key", sorted(RAISERS))
def test_index_builders_raise_documented_error(spark, sf0_dir, key):
    with pytest.raises(ValueError, match=RAISERS[key]):
        QUERIES[key](spark, sf0_dir).count()
