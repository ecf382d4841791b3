"""Config loader (YAML + WAL_ env overrides, config.go:96-117 analog)
and the /healthz + /ready probe surface (W6, listener.go:107-190)."""

import urllib.request

import pytest

from wal_listener_spark.config import load_config
from wal_listener_spark.probes import ProbeServer

YAML = """
listener:
  slotName: myslot_1
  filter:
    tables:
      repos:
        - insert
        - update
  topicsMap:
    public_repos: "code_repos"
publisher:
  type: kafka
  topic: "wal_listener"
  topicPrefix: "pre_"
spark:
  numBuckets: 64
"""


def test_yaml_config_loads(tmp_path):
    p = tmp_path / "conf.yml"
    p.write_text(YAML)
    cfg = load_config(str(p), env={})
    assert cfg.filter_tables == {"repos": ["insert", "update"]}
    assert cfg.topics_map == {"public_repos": "code_repos"}
    assert cfg.topic == "wal_listener" and cfg.topic_prefix == "pre_"
    assert cfg.num_buckets == 64


def test_env_overrides_yaml(tmp_path):
    p = tmp_path / "conf.yml"
    p.write_text(YAML)
    cfg = load_config(
        str(p),
        env={"WAL_PUBLISHER_TOPIC": "other", "WAL_SPARK_NUMBUCKETS": "128"},
    )
    assert cfg.topic == "other" and cfg.num_buckets == 128


def test_missing_required_topic_rejected(tmp_path):
    p = tmp_path / "conf.yml"
    p.write_text("publisher:\n  type: kafka\n")
    with pytest.raises(ValueError, match="publisher.topic"):
        load_config(str(p), env={})


def test_invalid_filter_action_rejected(tmp_path):
    p = tmp_path / "conf.yml"
    p.write_text(
        "listener:\n  filter:\n    tables:\n      repos:\n        - explode\n"
    )
    with pytest.raises(ValueError, match="invalid actions"):
        load_config(str(p), env={})


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_probe_server_healthz_ready_flip():
    state = {"ready": False}
    srv = ProbeServer(is_ready=lambda: state["ready"], port=0).start()
    try:
        assert _get(srv.port, "/healthz") == 200
        assert _get(srv.port, "/ready") == 503
        state["ready"] = True
        assert _get(srv.port, "/ready") == 200
        assert _get(srv.port, "/nope") == 404
    finally:
        srv.stop()
