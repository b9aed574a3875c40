"""Unified CLI dispatcher + config tools (xtuner entry_point.py:14,
tools/{list_cfg,copy_cfg,log_dataset,check_custom_dataset}.py parity)."""

import json

import pytest

from aurora_tpu.__main__ import main as aurora_main
from aurora_tpu.cli.cfg_tools import check_records, load_cfg_overrides


def test_help_and_unknown_mode(capsys):
    assert aurora_main([]) == 0
    assert "list-cfg" in capsys.readouterr().out
    assert aurora_main(["no-such-mode"]) == 1


def test_list_cfg(capsys):
    assert aurora_main(["list-cfg"]) == 0
    out = capsys.readouterr().out
    for expected in ("pretrain", "vision", "language", "auroracap_7b",
                     "vicuna", "eval tasks"):
        assert expected in out
    # pattern filter narrows output
    assert aurora_main(["list-cfg", "-p", "vision"]) == 0
    out = capsys.readouterr().out
    assert "vision" in out and "pretrain" not in out


def test_copy_cfg_roundtrip(tmp_path, capsys):
    dst = tmp_path / "cfg.json"
    assert aurora_main(["copy-cfg", "vision", str(dst)]) == 0
    raw = json.loads(dst.read_text())
    assert raw["_stage"] == "vision"
    assert raw["train"]["kept_ratio"] == 0.1
    assert raw["slowfast"] is True

    # edit a field and load back over the stage config
    raw["train"]["lr"] = 5e-5
    raw["batch_size"] = 3
    dst.write_text(json.dumps(raw))
    from aurora_tpu.train.configs import vision_stage
    stage = load_cfg_overrides(str(dst), vision_stage())
    assert stage.train.lr == 5e-5
    assert stage.batch_size == 3
    assert stage.train.kept_ratio == 0.1     # untouched field preserved

    assert aurora_main(["copy-cfg", "nope", str(dst)]) == 1


def test_check_records_validation():
    good = {"conversations": [
        {"from": "human", "value": "<image>\nwhat is this"},
        {"from": "gpt", "value": "a cat"}], "image": "x.jpg"}
    assert check_records([good]) == []

    no_ph = {"conversations": [{"from": "human", "value": "hi"},
                               {"from": "gpt", "value": "yo"}],
             "image": "x.jpg"}
    assert any("placeholder" in m for m in check_records([no_ph]))

    bad_roles = {"conversations": [{"from": "gpt", "value": "hi"}]}
    assert any("expected 'human'" in m for m in check_records([bad_roles]))

    ph_late = {"conversations": [
        {"from": "human", "value": "hi"},
        {"from": "gpt", "value": "yo"},
        {"from": "human", "value": "<image>\nnow?"}], "image": "x.jpg"}
    assert any("turn 0" in m for m in check_records([ph_late]))

    empty = {"conversations": []}
    assert any("conversations" in m for m in check_records([empty]))


def test_check_custom_dataset_cli(tmp_path, capsys):
    data = tmp_path / "d.json"
    data.write_text(json.dumps([
        {"conversations": [{"from": "human", "value": "<image>\nq"},
                           {"from": "gpt", "value": "a"}],
         "image": "x.jpg"},
        {"conversations": [{"from": "human", "value": "q"},
                           {"from": "gpt", "value": "a"}]},
    ]))
    assert aurora_main(["check-custom-dataset", "--data", str(data)]) == 0
    out = capsys.readouterr().out
    assert "2 records" in out and "0 issue" in out


def test_log_dataset_cli(tmp_path, capsys):
    from tests.utils import make_tiny_xtuner_dir
    model_dir = make_tiny_xtuner_dir(str(tmp_path / "model"))[0]
    data = tmp_path / "d.json"
    data.write_text(json.dumps([
        {"conversations": [{"from": "human", "value": "hello"},
                           {"from": "gpt", "value": "world"}]},
    ]))
    assert aurora_main(["log-dataset", "--data", str(data),
                        "--model_path", str(model_dir),
                        "-n", "1"]) == 0
    out = capsys.readouterr().out
    assert "sample 0" in out and "supervised" in out
