"""Per-session isolation tests."""

import os

from rho_tts_tpu.ui.config import AppConfig, GenerationRecord, VoiceProfile
from rho_tts_tpu.ui.session import SessionContext


def test_sessions_have_independent_config():
    base = AppConfig()
    s1 = SessionContext(base)
    s2 = SessionContext(base)
    s1.state.config.voices.append(VoiceProfile(id="only-s1", name="X"))
    assert s2.state.config.get_voice("only-s1") is None
    assert base.get_voice("only-s1") is None


def test_sessions_have_independent_history():
    base = AppConfig()
    s1, s2 = SessionContext(base), SessionContext(base)
    s1.state.add_record(GenerationRecord.new(text="a", voice_id="v", model_id="m", output_path=None))
    assert len(s1.state.history) == 1
    assert len(s2.state.history) == 0


def test_sessions_have_independent_cancellation():
    base = AppConfig()
    s1, s2 = SessionContext(base), SessionContext(base)
    t1 = s1.state.new_cancellation_token()
    t2 = s2.state.new_cancellation_token()
    s1.state.cancel_generation()
    assert t1.is_cancelled()
    assert not t2.is_cancelled()


def test_output_dir_lazy_and_cleaned():
    s = SessionContext(AppConfig())
    assert s._output_dir is None
    d = s.output_dir
    assert os.path.isdir(d)
    s.cleanup()
    assert not os.path.exists(d)
    assert s._output_dir is None


def test_cleanup_idempotent():
    s = SessionContext(AppConfig())
    _ = s.output_dir
    s.cleanup()
    s.cleanup()  # must not raise


def test_multi_user_state_never_persists(tmp_path, monkeypatch):
    from rho_tts_tpu.ui import config as cfgmod

    cfg_path = tmp_path / "config.json"
    monkeypatch.setenv(cfgmod.CONFIG_ENV, str(cfg_path))
    s = SessionContext(AppConfig())
    s.state.config.last_model_id = "changed"
    s.state.save()
    assert not cfg_path.exists()
