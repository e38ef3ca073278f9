"""JSONL corpus I/O: round trip, corrupt-line quarantine, gz shards."""

from __future__ import annotations

import gzip
import os

from vanus_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    from vanus_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path)
    back = read_documents_jsonl(spark, path)
    assert back.bad.count() == 0
    assert back.docs.count() == docs.count()
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.docs.collect()}
    assert a == b


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "{this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        '["wrong", "shape"]\n'
    )
    out = read_documents_jsonl(spark, str(p))
    assert {r.doc_id for r in out.docs.collect()} == {1, 2}
    bad = [r.raw_line for r in out.bad.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)


def test_jsonl_gzip_shards(spark, tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for s in range(3):
        with gzip.open(shard_dir / f"part-{s}.jsonl.gz", "wt") as f:
            for i in range(10):
                did = s * 10 + i
                f.write(
                    f'{{"doc_id": {did}, "text": "doc {did}", '
                    f'"lang": "en", "source": "src{s}", "n_chars": 6}}\n'
                )
    out = read_documents_jsonl(spark, str(shard_dir))
    assert out.docs.count() == 30
    assert out.bad.count() == 0
    # compressed output round-trips too
    dst = str(tmp_path / "out_gz")
    write_documents_jsonl(out.docs, dst, compression="gzip")
    assert any(f.endswith(".gz") for f in os.listdir(dst))
    again = read_documents_jsonl(spark, dst)
    assert again.docs.count() == 30
