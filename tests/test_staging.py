"""Durable staging + resume contract (operators/staging.py) — the
restart-after-failure semantics of the composed pipelines."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Row

from movie_rec_spark.operators.staging import make_stage

pytestmark = pytest.mark.usefixtures("spark")


def _df(spark, vals):
    return spark.createDataFrame([Row(doc_id=v) for v in vals])


def test_resume_reads_completed_stage_without_recompute(spark, tmp_path):
    """A completed stage (parquet _SUCCESS + matching fingerprint
    marker) is READ on resume — proven by handing the resume call a
    DIFFERENT frame under the same stage name and getting the
    ORIGINAL rows back (the new lineage never executes)."""
    d = str(tmp_path / "stages")
    params = {"p": 1}
    first = make_stage(d, params=params)(_df(spark, [1, 2, 3]), "s1")
    assert sorted(r.doc_id for r in first.collect()) == [1, 2, 3]
    resumed = make_stage(d, resume=True, params=params)(
        _df(spark, [9, 9, 9]), "s1")
    assert sorted(r.doc_id for r in resumed.collect()) == [1, 2, 3]


def test_resume_refuses_parameter_mismatch(spark, tmp_path):
    """Resuming under different pipeline parameters must raise, not
    silently mix configurations."""
    d = str(tmp_path / "stages")
    make_stage(d, params={"p": 1})(_df(spark, [1]), "s1")
    with pytest.raises(ValueError, match="DIFFERENT pipeline param"):
        make_stage(d, resume=True, params={"p": 2})(
            _df(spark, [1]), "s1")


def test_rewrite_drops_stale_fingerprint_marker(spark, tmp_path):
    """Re-staging under NEW parameters must invalidate the OLD
    marker: a later resume under the old parameters would otherwise
    adopt rows computed under the new ones."""
    d = str(tmp_path / "stages")
    make_stage(d, params={"p": 1})(_df(spark, [1]), "s1")
    make_stage(d, params={"p": 2})(_df(spark, [2]), "s1")
    markers = [f for f in os.listdir(d) if f.startswith("s1.fp-")]
    assert len(markers) == 1, markers
    with pytest.raises(ValueError, match="DIFFERENT pipeline param"):
        make_stage(d, resume=True, params={"p": 1})(
            _df(spark, [3]), "s1")
    ok = make_stage(d, resume=True, params={"p": 2})(
        _df(spark, [3]), "s1")
    assert [r.doc_id for r in ok.collect()] == [2]


def test_resume_requires_stage_dir(spark):
    with pytest.raises(ValueError, match="requires stage_dir"):
        make_stage(None, resume=True)


def test_pipeline_media_resumes_missing_suffix_only(spark, tmp_path):
    """End-to-end restart: stage a full media-pipeline run, delete
    the LAST stage ('kept'), resume — identical manifest, and the
    untouched prefix stages are reused (parquet mtimes unchanged)."""
    from movie_rec_spark.operators import multimodal as MM

    docs = _df(spark, range(32))
    d = str(tmp_path / "media")
    base = [tuple(r) for r in MM.q_pipeline_media(
        docs, stage_dir=d).collect()]
    prefix_mtime = {
        s: os.path.getmtime(os.path.join(d, s, "_SUCCESS"))
        for s in ("image_pairs", "audio_pairs")}
    shutil.rmtree(os.path.join(d, "kept"))
    resumed = [tuple(r) for r in MM.q_pipeline_media(
        docs, stage_dir=d, resume=True).collect()]
    assert resumed == base
    for s, t in prefix_mtime.items():
        assert os.path.getmtime(
            os.path.join(d, s, "_SUCCESS")) == t, f"{s} recomputed"


def test_pipeline_llm_resume_equals_fresh(spark, tmp_path):
    """q_pipeline_llm: a resumed run over a fully-staged directory
    ships exactly the fresh run's rows."""
    from movie_rec_spark.operators import text as T
    from movie_rec_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    d = str(tmp_path / "llm")
    base = [tuple(r) for r in T.q_pipeline_llm(
        docs, stage_dir=d).collect()]
    resumed = [tuple(r) for r in T.q_pipeline_llm(
        docs, stage_dir=d, resume=True).collect()]
    assert resumed == base


def test_resume_recomputes_partial_stage_without_success_marker(
        spark, tmp_path):
    """A stage directory left by a run that died mid-write (parquet
    files present, no _SUCCESS) is NOT trusted: resume recomputes and
    overwrites it."""
    d = str(tmp_path / "stages")
    params = {"p": 1}
    make_stage(d, params=params)(_df(spark, [1, 2]), "s1")
    os.remove(os.path.join(d, "s1", "_SUCCESS"))
    resumed = make_stage(d, resume=True, params=params)(
        _df(spark, [7, 8]), "s1")
    assert sorted(r.doc_id for r in resumed.collect()) == [7, 8]
