"""main.py spark-submit entry: end-to-end over a parquet web_pages table,
including survivors + cluster write-back and checkpoint resume."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_spark_submit_py_files_zip(spark, tmp_path):
    """The north-rule deployment shape: spark-submit --py-files <pkg.zip>
    main.py, run from OUTSIDE the repo so the package can only come from the
    zip. Skipped when spark-submit isn't on PATH."""
    import os
    import shutil

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, str(REPO / "scripts"))
    from make_dist import build_zip

    from daft_minhash_dedupe_spark.sources.synthetic import generate_web_pages

    df, _ = generate_web_pages(spark, n_rows=40, seed=5)
    inp = str(tmp_path / "web_pages")
    df.write.parquet(inp)

    zip_path = build_zip(tmp_path / "pkg.zip")
    run_dir = tmp_path / "elsewhere"
    run_dir.mkdir()
    shutil.copy(REPO / "main.py", run_dir / "main.py")

    out = str(tmp_path / "out_submit")
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_MASTER": "local[4]", "SPARK_GRAFT_DRIVER_MEM": "4g"})
    r = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--py-files", str(zip_path),
            str(run_dir / "main.py"),
            "--input", inp, "--output", out,
            "--checkpoint", str(tmp_path / "ckpt_submit"),
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(run_dir),
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-3000:]
    assert spark.read.parquet(f"{out}/clusters").count() == 40


def test_main_cli_end_to_end(spark, tmp_path):
    # build a small input table with the session fixture, then run the CLI as
    # its own process (it creates its own local session)
    from daft_minhash_dedupe_spark.sources.synthetic import generate_web_pages

    df, _ = generate_web_pages(spark, n_rows=60, seed=3)
    inp = str(tmp_path / "web_pages")
    df.write.parquet(inp)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cmd = [
        sys.executable, str(REPO / "main.py"),
        "--input", inp, "--output", out, "--checkpoint", ckpt, "--resume",
    ]
    import os

    env = dict(os.environ)
    env.update({"SPARK_GRAFT_MASTER": "local[4]", "SPARK_GRAFT_DRIVER_MEM": "4g"})
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO))
    assert r.returncode == 0, r.stderr[-3000:]
    assert "rows before:  60" in r.stdout

    survivors = spark.read.parquet(f"{out}/survivors")
    clusters = spark.read.parquet(f"{out}/clusters")
    n_surv = survivors.count()
    assert 0 < n_surv <= 60
    assert clusters.count() == 60
    assert set(["block_id", "block_text", "component"]) <= set(clusters.columns)
    # keep-rule consistency: one survivor per cluster
    assert clusters.select("component").distinct().count() == n_surv
    # stage markers present for resume
    assert (Path(ckpt) / "signatures" / "_STAGE_OK").exists()


def test_cluster_ids_deterministic_across_parallelism_and_resume(spark, tmp_path):
    """The deterministic-id design (xxhash64 node ids + min-label CC) implies
    the (url, component) table is bit-identical across parallelism levels and
    across a mid-pipeline checkpoint resume — no monotonically_increasing_id
    anywhere (FRICTION_LOG.md:88-91 regret, fixed by design)."""
    import os
    import shutil

    from daft_minhash_dedupe_spark.sources.synthetic import generate_web_pages

    df, _ = generate_web_pages(spark, n_rows=300, seed=11)
    inp = str(tmp_path / "web_pages")
    df.write.parquet(inp)

    def run(master, out, ckpt, resume=False):
        env = dict(os.environ)
        env.update({"SPARK_GRAFT_MASTER": master, "SPARK_GRAFT_DRIVER_MEM": "4g"})
        cmd = [
            sys.executable, "main.py",
            "--input", inp, "--output", out, "--checkpoint", ckpt,
        ] + (["--resume"] if resume else [])
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO)
        )
        assert r.returncode == 0, (r.stderr or r.stdout)[-3000:]

    def clusters(out):
        return {
            (r["block_id"], r["component"])
            for r in spark.read.parquet(f"{out}/clusters").collect()
        }

    run("local[2]", str(tmp_path / "out2"), str(tmp_path / "ck2"))
    run("local[8]", str(tmp_path / "out8"), str(tmp_path / "ck8"))
    c2, c8 = clusters(str(tmp_path / "out2")), clusters(str(tmp_path / "out8"))
    assert len(c2) == 300 and c2 == c8

    # resume from a MID-pipeline checkpoint: keep local[2]'s early stages,
    # drop everything from bands onward, re-run at local[8] with --resume —
    # recomputed later stages over resumed earlier stages must agree too
    for stage in ("bands", "pairs", "components"):
        shutil.rmtree(tmp_path / "ck2" / stage, ignore_errors=True)
    run("local[8]", str(tmp_path / "out_resumed"), str(tmp_path / "ck2"), resume=True)
    assert clusters(str(tmp_path / "out_resumed")) == c2


def test_cli_tiered_mode(spark, tmp_path):
    """--tiers exact,line,substr,minhash runs the full cascade over
    URL-string ids and writes survivors + prints per-tier metrics."""
    import os

    from daft_minhash_dedupe_spark.sources.synthetic import generate_web_pages

    df, _ = generate_web_pages(spark, n_rows=60, seed=7)
    inp = str(tmp_path / "web_pages")
    df.write.parquet(inp)

    out = str(tmp_path / "out_tiered")
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_MASTER": "local[4]", "SPARK_GRAFT_DRIVER_MEM": "4g"})
    r = subprocess.run(
        [
            sys.executable, "main.py",
            "--input", inp, "--output", out,
            "--tiers", "exact,line,substr,minhash",
            "--line-min-dup-docs", "3", "--substr-window-tokens", "8",
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO),
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-3000:]
    assert "tier exact" in r.stdout and "tier minhash" in r.stdout
    assert "tier substr_spans" in r.stdout
    surv = spark.read.parquet(f"{out}/survivors")
    assert {"block_id", "block_text", "cleaned_text", "substr_text"} <= set(
        surv.columns
    )
    n = surv.count()
    assert 0 < n <= 60
    # survivor ids are a subset of the input's url universe (string ids
    # round-tripped intact through the minhash tier)
    urls = {r["url"] for r in df.select("url").collect()}
    assert {r["block_id"] for r in surv.select("block_id").collect()} <= urls


def test_cli_tiered_rejects_incremental_combo(tmp_path):
    r = subprocess.run(
        [
            sys.executable, "main.py",
            "--input", "x", "--output", "y",
            "--tiers", "exact,line", "--prior-checkpoint", "z",
        ],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert r.returncode != 0
    assert "minhash" in (r.stderr + r.stdout)
