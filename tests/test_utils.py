import json
import os

from ahrag_tpu.utils.config import DEFAULT_CONFIG, load_config, set_nested
from ahrag_tpu.utils.llm import LLMModule, get_llm_manager
from ahrag_tpu.utils.logging import get_logger
from ahrag_tpu.utils.tokens import count_tokens


def test_config_contract_sections():
    cfg = load_config(path=None)
    # the contract the reference's stale test wanted (SURVEY §4): full schema present
    for section in ("llm", "logging", "search", "inference", "agent", "answer",
                    "evaluation", "rl", "encoder", "mesh"):
        assert section in cfg, section
    assert isinstance(cfg["answer"]["use_llm"], bool)
    assert cfg["search"]["alpha"] == 0.6 and cfg["search"]["delta"] == 0.1


def test_config_yaml_and_env_override(tmp_path, monkeypatch):
    p = tmp_path / "c.yaml"
    p.write_text("search:\n  alpha: 0.9\n", encoding="utf-8")
    monkeypatch.setenv("LOG_LEVEL", "debug")
    cfg = load_config(path=str(p))
    assert cfg["search"]["alpha"] == 0.9
    assert cfg["search"]["beta"] == 0.2  # deep merge keeps siblings
    assert cfg["logging"]["log_level"] == "debug"


def test_set_nested():
    d = {}
    set_nested(d, "a.b.c", 1)
    assert d == {"a": {"b": {"c": 1}}}


def test_token_count_fallback_contract():
    assert count_tokens("") == 0
    assert count_tokens("abc") >= 1
    long = "hello world " * 50
    assert count_tokens(long) > 50


def test_session_logger_writes_and_redacts(tmp_path):
    log = get_logger(str(tmp_path), "s1", level="normal", redact=True)
    log.info(action="reset", api_key="SECRET", step=0)
    log.debug(action="hidden")  # below level
    lines = (tmp_path / "events.jsonl").read_text().strip().splitlines()
    assert len(lines) == 1
    ev = json.loads(lines[0])
    assert ev["api_key"] == "[REDACTED]" and ev["action"] == "reset"
    assert "ts" in ev and ev["session_id"] == "s1"


def test_logger_level_off(tmp_path):
    log = get_logger(str(tmp_path / "off"), "s2", level="off")
    log.info(action="x")
    assert not os.path.exists(tmp_path / "off" / "events.jsonl")


def test_llm_disabled_by_default():
    mgr = get_llm_manager(load_config(path=None))
    assert not mgr.is_enabled(LLMModule.ANSWER_GENERATION)


def test_fake_llm_backend(fake_llm):
    fake_llm["responses"].append("hello from fake")
    mgr = get_llm_manager()
    assert mgr.is_enabled(LLMModule.AGENT_DECISION)  # backend forces enabled
    out = mgr.chat(LLMModule.AGENT_DECISION, [{"role": "user", "content": "hi"}])
    assert out == "hello from fake"
    assert fake_llm["n"] == 1


def test_llm_module_config_layers():
    cfg = load_config(path=None, overrides={"llm": {"modules": {"agent_decision": {
        "enabled": True, "model": "m-x", "max_retries": 7}}}})
    mgr = get_llm_manager(cfg)
    mc = mgr.model_config(LLMModule.AGENT_DECISION)
    assert mc["model"] == "m-x" and mc["max_retries"] == 7
    assert mc["retry_wait"] == 2.0  # global default layered in
