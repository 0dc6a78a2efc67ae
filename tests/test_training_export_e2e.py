"""End-to-end training export: tokenize → pack → manifest-sharded write.

Integration test proving the corpus-to-tensors pieces compose: encode the
documents table with a corpus-fit vocabulary, lay the encoded docs into
fixed-budget sequences per shard, export hive-partitioned by shard with an
integrity manifest, verify the manifest, and check the read-back layout is
exactly the planned one.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from systems_spark.operators import SequencePacker, VocabTokenizer
from systems_spark.sources import verify_manifest, write_manifest_parquet


def test_tokenize_pack_export_roundtrip(spark, tables, tmp_path):
    docs = tables["documents"].select("doc_id", "text")

    tk = VocabTokenizer(vocab_size=256).fit(docs)
    encoded = tk.transform(docs)  # doc_id, n_tokens, input_ids (+text)

    packed = (SequencePacker(id_col="doc_id", token_col="n_tokens",
                             budget=128, n_shards=4)
              .transform(encoded)
              .select("doc_id", "n_tokens", "input_ids",
                      "shard", "seq_in_shard", "begin_offset", "n_seqs"))

    p = str(tmp_path / "export")
    manifest = write_manifest_parquet(packed, p, shard_col="shard")
    assert verify_manifest(spark, p)["ok"]
    assert manifest["rows"] == docs.count()  # packing is row-preserving

    back = spark.read.parquet(p)
    # layout invariant per shard: offsets are a running sum of token
    # counts, and every doc's ids survived the export byte-for-byte
    rows = back.orderBy("shard", "seq_in_shard", "begin_offset").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        cum = 0
        for r in sorted(rs, key=lambda r: r.doc_id):
            assert r.seq_in_shard == cum // 128
            assert r.begin_offset == cum % 128
            cum += r.n_tokens
    enc = {r.doc_id: r.input_ids for r in encoded.collect()}
    for r in rows:
        assert list(r.input_ids) == list(enc[r.doc_id])
        assert len(r.input_ids) == r.n_tokens
