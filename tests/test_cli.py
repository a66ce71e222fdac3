"""CLI surface (python -m database_cloner_spark) — the reference's
./clone_databases.sh entry point: conf + positional list, narrative
output, success-ratio exit contract (clone_databases.sh:1008-1118)."""

from __future__ import annotations

import os

from database_cloner_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_cli_conf_driven_clone(spark, tmp_path, capsys):
    conf = tmp_path / "clone.conf"
    conf.write_text(
        "# test conf\n"
        'DATABASES_TO_CLONE=region, nation\n'
        'DB_PREFIX="clone_"\n'
        "CREATE_BACKUP_BEFORE_CLONE=false\n"
        'PG_HOST="pg-lb.internal"\n'
        "PG_PORT=5432\n"
    )
    target = str(tmp_path / "out")
    rc = main([
        "--conf", str(conf), "--source-dir", SF, "--target-dir", target,
        "--parallelism", "2", "--seed", "7",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Cloning process finished: 2/2 successful" in out
    assert os.path.exists(os.path.join(target, "clone_region.parquet"))
    assert os.path.exists(os.path.join(target, "clone_nation.parquet"))


def test_cli_positional_overrides_conf_and_failure_exit(spark, tmp_path, capsys):
    conf = tmp_path / "clone.conf"
    conf.write_text("DATABASES_TO_CLONE=region\nDB_PREFIX=clone_\n")
    target = str(tmp_path / "out2")
    # positional list overrides conf; one bogus table -> nonzero exit
    rc = main([
        "supplier,nope_missing", "--conf", str(conf),
        "--source-dir", SF, "--target-dir", target, "--seed", "7",
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[OK  ] supplier -> clone_supplier" in out
    assert "[FAIL] nope_missing" in out
    assert "1/2 successful" in out
    assert not os.path.exists(os.path.join(target, "clone_region.parquet"))


def test_prompt_password_confirmation_loop(capsys):
    """clone_databases.sh:264-289: empty rejected, mismatch re-prompts,
    matching confirmation returns."""
    from database_cloner_spark.__main__ import prompt_password

    answers = iter(["", "hunter2", "wrong", "hunter2", "hunter2"])
    pw = prompt_password("Enter admin password", reader=lambda _p: next(answers))
    assert pw == "hunter2"
    err = capsys.readouterr().err
    assert "Password cannot be empty" in err
    assert "Passwords do not match" in err


def test_cli_prompt_flag_reads_password(tmp_path, monkeypatch):
    """--prompt wires the interactive credential into CloneConfig; conf
    ADMIN_PASSWORD wins over the prompt (CS:107-109 precedence)."""
    import database_cloner_spark.__main__ as cli

    seen = {}

    class FakePipeline:
        def __init__(self, spark, cfg):
            seen["cfg"] = cfg

        def run(self):
            from database_cloner_spark.pipeline.clone import CloneRunResult, TableResult

            r = CloneRunResult()
            r.results.append(TableResult("region", "clone_region", "cloned", rows=5))
            return r

    monkeypatch.setattr("database_cloner_spark.pipeline.ClonePipeline", FakePipeline)
    monkeypatch.setattr(
        "getpass.getpass", lambda prompt="": "prompted-secret"
    )
    rc = cli.main([
        "region",
        "--source-dir", "/root/testdata/sf0.001",
        "--target-dir", str(tmp_path / "t"),
        "--prompt",
    ])
    assert rc == 0
    assert seen["cfg"].admin_password == "prompted-secret"

    conf = tmp_path / "clone.conf"
    conf.write_text("ADMIN_PASSWORD=from-conf\n")
    rc = cli.main([
        "region",
        "--source-dir", "/root/testdata/sf0.001",
        "--target-dir", str(tmp_path / "t2"),
        "--conf", str(conf),
        "--prompt",
    ])
    assert rc == 0
    assert seen["cfg"].admin_password == "from-conf"
