"""CLI entry-point test (reference R15 parity: bin/build-graph-db)."""

import os
import subprocess
import sys

import yaml


def test_cli_build_end_to_end(tmp_path):
    cfg = {
        "Database": {"name": "CliGraph", "version": "0.1"},
        "Sources": {"TPCH": {"source type": "parquet", "path": "/root/testdata/sf0.001"}},
        "Nodes": {
            "Nation": {
                "sources": {"TPCH": {"table": "nation", "id_key": "n_nationkey", "uri_key": "n_name"}}
            }
        },
        "Relationships": {},
    }
    cfg_file = tmp_path / "config.yml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "out"

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [sys.executable, "-m", "graphdbetl_spark", "build", "-f", str(cfg_file),
         "-o", str(out), "--neo4j"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "built 1 node type(s)" in res.stdout
    assert (out / "nodes" / "Nation").is_dir()
    assert (out / "neo4j" / "nodes" / "Nation").is_dir()
