"""CLI `pipeline` command: the queries() surface is drivable from the
command line with sampled-JSON or partitioned-parquet output."""

import json

import duckdb
import pytest


@pytest.mark.usefixtures("ray_session")
def test_pipeline_command(tmp_path, capsys):
    from probly_search_ray.cli import main

    main(["pipeline", "--name", "list"])
    names = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "tfidf_top3" in names and len(names) >= 70

    main(["pipeline", "--name", "token_stats",
          "--sf-dir", "/root/testdata/sf0.001", "--head", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 500
    assert out["columns"] == ["doc_id", "n_tokens", "n_unique"]
    assert len(out["head"]) == 2

    dest = str(tmp_path / "out")
    main(["pipeline", "--name", "top_terms",
          "--sf-dir", "/root/testdata/sf0.001", "--out", dest])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files"] >= 1
    rows = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{dest}/*.parquet')").fetchone()
    assert rows[0] == 20

    with pytest.raises(SystemExit):
        main(["pipeline", "--name", "no_such_pipeline"])
