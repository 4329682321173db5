"""Utility-layer tests: audio I/O round trip, plotting, metrics logging,
step timing, compile-cache gating."""
import json
import os

import numpy as np


class TestAudio:
    def test_wav_roundtrip_and_resample(self, tmp_path):
        from megatts2_tpu.utils.audio import load_wav, peak_normalize, save_wav

        y = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)
        p = str(tmp_path / "a.wav")
        save_wav(p, y, 16000)
        back = load_wav(p, 16000)
        np.testing.assert_allclose(back, y, atol=1e-3)
        # resampled load: half-length at 8 kHz
        back8 = load_wav(p, 8000)
        assert abs(back8.shape[0] - 4000) <= 4

    def test_peak_normalize(self):
        from megatts2_tpu.utils.audio import peak_normalize

        y = np.array([0.1, -0.5, 0.25], np.float32)
        out = peak_normalize(y)
        assert abs(np.abs(out).max() - 1.0) < 1e-6
        assert (peak_normalize(np.zeros(4, np.float32)) == 0).all()


class TestPlotting:
    def test_mel_figure_written(self, tmp_path):
        from megatts2_tpu.utils.plotting import save_spectrogram_plot

        rng = np.random.RandomState(0)
        path = save_spectrogram_plot(
            str(tmp_path / "mel"), rng.randn(80, 40), rng.randn(80, 40)
        )
        assert os.path.exists(path)
        assert os.path.getsize(path) > 1000


class TestLogging:
    def test_metrics_jsonl(self, tmp_path):
        from megatts2_tpu.utils.logging import MetricsLogger

        lg = MetricsLogger(str(tmp_path), "t")
        lg.log(1, {"loss": 0.5}, prefix="train/")
        lg.log(2, {"loss": 0.25}, prefix="train/")
        lg.close()
        rows = [json.loads(l) for l in open(lg.path)]
        assert rows[0]["train/loss"] == 0.5 and rows[1]["step"] == 2

    def test_step_timer_updates_every_tick(self):
        from megatts2_tpu.utils.logging import StepTimer

        t = StepTimer(window=4)
        for _ in range(3):
            t.tick()
        assert t.steps_per_sec > 0


class TestCompileCacheGating:
    def test_cpu_backend_skips_cache(self, tmp_path, monkeypatch):
        import jax

        from megatts2_tpu import enable_compilation_cache

        monkeypatch.setenv("MEGATTS2_TPU_COMPILE_CACHE", str(tmp_path / "cc"))
        assert jax.default_backend() == "cpu"  # conftest forces cpu
        enable_compilation_cache()
        assert not os.path.exists(str(tmp_path / "cc"))  # no-op on cpu


class TestConfigUnknownKeyWarning:
    def test_typo_knob_warns(self):
        import warnings

        from megatts2_tpu.config import MegaPLMConfig, _build

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            cfg = _build(
                MegaPLMConfig,
                {"init_args": {"n_layer": 3, "n_heads": 2}},  # typo: n_layer
            )
        assert cfg.n_heads == 2 and cfg.n_layers == 12  # default kept
        assert any("n_layer" in str(x.message) for x in w), [str(x.message) for x in w]

    def test_exact_keys_silent(self):
        import warnings

        from megatts2_tpu.config import MegaADMConfig, _build

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _build(MegaADMConfig, {"init_args": {"n_layers": 2, "n_heads": 2}})
        assert not w, [str(x.message) for x in w]


class TestDominantF0:
    def test_picks_fundamental(self):
        import sys

        sys.path.insert(0, "tools")
        from e2e_quality import dominant_f0

        sr = 16000
        t = np.arange(2 * sr) / sr
        # harmonic stack, fundamental 130 Hz strongest (corpus-like)
        y = sum((0.4 / h) * np.sin(2 * np.pi * 130 * h * t) for h in range(1, 5))
        f0 = dominant_f0(y.astype(np.float32), sr)
        assert abs(f0 - 130.0) < 2.0
        assert dominant_f0(np.zeros(100, np.float32), sr) == 0.0  # too short
