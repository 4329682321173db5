"""CLI-level tests: training resume from the latest checkpoint, and the
inference CLI arg path with random-init models (tiny configs)."""
import os

import numpy as np
import pytest

import jax

GAN_TINY = """
trainer:
  max_steps: {steps}
  log_every_n_steps: 1
  val_check_interval: 100
model:
  G:
    mrte:
      mel_bins: 80
      mel_stride: 16
      mel_n_layer: 1
      mel_n_stack: 1
      mel_n_block: 1
      content_ff_dim: 32
      content_n_heads: 2
      content_n_layers: 1
      hidden_size: 16
      phone_vocab_size: 40
      dropout: 0.0
    vqpe:
      {{mel_bins: 20, stride: 8, hidden_size: 16, kernel_size: 3, n_layers: 1,
       n_stacks: 1, n_blocks: 1, vq_bins: 32, vq_dim: 8}}
    kernel_size: 3
    hidden_size: 16
    decoder_n_stack: 1
    decoder_n_block: 1
  D: {{time_lengths: [8, 16], freq_length: 80, hidden_size: 8}}
  initial_learning_rate: 1.0e-4
  warmup_steps: 1
  train_dtype: float32
data:
  ds_path: {ds}/
  max_duration_batch: 30
  min_duration: 0.5
  max_duration: 30
  num_buckets: 1
"""


def make_gan_ds(tmp_path):
    """Minimal on-disk GAN dataset (features + manifests + symbols)."""
    from megatts2_tpu.data import Cut, CutManifest, FeatureWriter

    rng = np.random.RandomState(0)
    ds = str(tmp_path / "ds")
    os.makedirs(ds, exist_ok=True)
    for split, n in (("train", 6), ("valid", 2)):
        cuts = []
        with FeatureWriter(os.path.join(ds, f"feats_{split}.bin"), dim=80) as w:
            for i in range(n):
                frames = 40
                mel = rng.randn(frames, 80).astype(np.float32)
                p, o = w.add(mel)
                cuts.append(
                    Cut(f"{split}{i}", f"spk{i % 2}", 2.0, frames,
                        ["a", "b", "c", "d"], [10, 10, 10, 10], "", p, o)
                )
        CutManifest(cuts).save(os.path.join(ds, f"cuts_{split}.jsonl.gz"))
    with open(os.path.join(ds, "unique_text_tokens.k2symbols"), "w") as f:
        for i, s in enumerate(["<eps>", "a", "b", "c", "d"]):
            f.write(f"{s} {i}\n")
    return ds


class TestTrainResume:
    def test_fit_then_resume_continues_from_checkpoint(self, tmp_path):
        from megatts2_tpu.cli import main as cli_main
        from megatts2_tpu.training.checkpoints import latest_checkpoint, restore_pytree

        ds = make_gan_ds(tmp_path)
        cfg2 = str(tmp_path / "gan2.yaml")
        open(cfg2, "w").write(GAN_TINY.format(steps=2, ds=ds))
        ck = str(tmp_path / "ck")
        logd = str(tmp_path / "logs")
        cli_main(["fit", "-c", cfg2, "--log_dir", logd, "--ckpt_dir", ck])
        p1 = latest_checkpoint(ck)
        assert p1 and p1.endswith("step_2")

        # resume: bump max_steps to 4; cli auto-restores latest
        cfg4 = str(tmp_path / "gan4.yaml")
        open(cfg4, "w").write(GAN_TINY.format(steps=4, ds=ds))
        cli_main(["fit", "-c", cfg4, "--log_dir", logd, "--ckpt_dir", ck])
        p2 = latest_checkpoint(ck)
        assert p2.endswith("step_4")
        state = restore_pytree(p2)
        assert int(np.asarray(state["step"])) == 4


class TestInferCLI:
    def test_infer_main_random_init(self, tmp_path):
        from megatts2_tpu.infer import main as infer_main
        from megatts2_tpu.utils.audio import load_wav, save_wav

        # tiny configs
        gan = str(tmp_path / "gan.yaml")
        open(gan, "w").write(GAN_TINY.format(steps=1, ds=tmp_path))
        plm = str(tmp_path / "plm.yaml")
        open(plm, "w").write(
            "model:\n  plm: {n_layers: 1, n_heads: 2, vq_dim: 8, tc_latent_dim: 16, "
            "vq_bins: 32, dropout: 0.0}\n  initial_learning_rate: 1e-4\n"
        )
        adm = str(tmp_path / "adm.yaml")
        open(adm, "w").write(
            "model:\n  adm: {n_layers: 1, n_heads: 2, emb_dim: 8, tc_latent_dim: 16, "
            "tc_emb_dim: 8, dropout: 0.0}\n  initial_learning_rate: 1e-4\n"
        )
        sym = str(tmp_path / "sym")
        with open(sym, "w") as f:
            for i, s in enumerate(["<eps>", "_", "hello", "world"]):
                f.write(f"{s} {i}\n")
        wavs = tmp_path / "wavs"
        wavs.mkdir()
        t = np.arange(4000) / 16000
        save_wav(str(wavs / "p.wav"), (0.2 * np.sin(2 * np.pi * 250 * t)).astype(np.float32))

        out = str(tmp_path / "out.wav")
        infer_main([
            "--wavs_dir", str(wavs), "--text", "hello world", "--out", out,
            "--g_config", gan, "--plm_config", plm, "--adm_config", adm,
            "--symbol_table", sym, "--max_frames", "64", "--dtype", "float32",
        ])
        assert os.path.exists(out)
        y = load_wav(out)
        assert y.shape[0] > 4000 and np.isfinite(y).all()


class TestServeBucketing:
    def test_pick_bucket(self):
        from megatts2_tpu.serve import pick_bucket

        buckets = [256, 512, 1024, 2048]
        assert pick_bucket(10, 16.0, buckets) == 256
        assert pick_bucket(16, 16.0, buckets) == 256
        assert pick_bucket(17, 16.0, buckets) == 512
        assert pick_bucket(64, 16.0, buckets) == 1024
        assert pick_bucket(1000, 16.0, buckets) == 2048  # capped at the max


def _serve_fixture(tmp_path):
    """Tiny random-weight orbax checkpoints + configs + prompt dir +
    symbol table for serve.py tests.  Returns a dict of paths."""
    import jax.numpy as jnp

    from megatts2_tpu.config import (
        MegaADMConfig,
        MegaPLMConfig,
        load_gan_config,
    )
    from megatts2_tpu.models import MegaADM, MegaG, MegaPLM
    from megatts2_tpu.training.checkpoints import save_checkpoint
    from megatts2_tpu.utils.audio import save_wav

    gan = str(tmp_path / "gan.yaml")
    open(gan, "w").write(GAN_TINY.format(steps=1, ds=tmp_path))
    plm = str(tmp_path / "plm.yaml")
    open(plm, "w").write(
        "model:\n  plm: {n_layers: 1, n_heads: 2, vq_dim: 8, tc_latent_dim: 16, "
        "vq_bins: 32, dropout: 0.0, use_flash: false}\n  initial_learning_rate: 1e-4\n"
    )
    adm = str(tmp_path / "adm.yaml")
    open(adm, "w").write(
        "model:\n  adm: {n_layers: 1, n_heads: 2, emb_dim: 8, tc_latent_dim: 16, "
        "tc_emb_dim: 8, dropout: 0.0}\n  initial_learning_rate: 1e-4\n"
    )
    voc = str(tmp_path / "voc.yaml")
    open(voc, "w").write(
        "model:\n  vocoder:\n    family: vocos\n"
        "    init_args: {dim: 16, intermediate_dim: 32, num_layers: 1}\n"
    )

    g_cfg, _, _ = load_gan_config(gan)
    key = jax.random.PRNGKey(0)
    g_vars = jax.jit(MegaG(g_cfg).init)(
        {"params": key, "vq": key},
        jnp.ones((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
        jnp.asarray([8]), jnp.zeros((1, 64, 80)), jnp.zeros((1, 64, 80)),
    )
    plm_params = jax.jit(MegaPLM(MegaPLMConfig(
        n_layers=1, n_heads=2, vq_dim=8, tc_latent_dim=16, vq_bins=32,
        dropout=0.0, use_flash=False,
    )).init)(key, jnp.zeros((1, 4, 16)), jnp.zeros((1, 5), jnp.int32),
             jnp.asarray([4]))["params"]
    adm_params = jax.jit(MegaADM(MegaADMConfig(
        n_layers=1, n_heads=2, emb_dim=8, tc_latent_dim=16, tc_emb_dim=8,
        dropout=0.0,
    )).init)(key, jnp.zeros((1, 4, 16)), jnp.zeros((1, 5, 1)),
             jnp.asarray([4]))["params"]

    g_ck = str(tmp_path / "ck_g")
    plm_ck = str(tmp_path / "ck_plm")
    adm_ck = str(tmp_path / "ck_adm")
    save_checkpoint(g_ck, {"g_params": g_vars["params"],
                           "vq_stats": g_vars["vq_stats"]}, 1)
    save_checkpoint(plm_ck, {"params": plm_params}, 1)
    save_checkpoint(adm_ck, {"params": adm_params}, 1)

    sym = str(tmp_path / "sym")
    with open(sym, "w") as f:
        for i, s in enumerate(["<eps>", "_", "hello", "world", "nice", "day"]):
            f.write(f"{s} {i}\n")
    prompts = tmp_path / "prompts"
    prompts.mkdir()
    t = np.arange(4000) / 16000
    save_wav(str(prompts / "p.wav"),
             (0.2 * np.sin(2 * np.pi * 250 * t)).astype(np.float32))

    # tiny stage-2 prompt dataset (in-context prosody prompting surface):
    # one cut for speaker spkA with latents at the tiny-PLM dims
    from megatts2_tpu.data.manifest import Cut, CutManifest

    prompt_ds = tmp_path / "prompt_ds"
    (prompt_ds / "latents" / "spkA").mkdir(parents=True)
    rng = np.random.RandomState(7)
    durs = [2, 3, 1, 2]  # 8 frames -> 1 code
    tp = len(durs)
    n_frames = sum(durs)
    n_codes = -(-n_frames // 8)
    cut = Cut(id="c0", speaker="spkA", duration=n_frames * 256 / 16000,
              num_frames=n_frames, phone_tokens=["hello"] * tp,
              duration_tokens=durs)
    CutManifest([cut]).save(str(prompt_ds / "cuts_train.jsonl.gz"))
    np.save(str(prompt_ds / "latents" / "spkA" / "c0.npy"),
            {"tc_latent": rng.randn(1, tp, 16).astype(np.float32),
             "p_code": rng.randint(0, 32, (1, 1, n_codes)).astype(np.int32)},
            allow_pickle=True)
    return dict(gan=gan, plm=plm, adm=adm, voc=voc, sym=sym,
                g_ck=g_ck, plm_ck=plm_ck, adm_ck=adm_ck,
                prompts=str(prompts), prompt_ds=str(prompt_ds))


class TestServeEndToEnd:
    def test_serve_main_with_orbax_ckpts(self, tmp_path, capsys):
        """serve.py end-to-end: orbax checkpoints -> bucketed batch
        synthesis -> wavs + throughput JSON (random weights, tiny configs);
        also exercises --vocoder vocos."""
        import json

        from megatts2_tpu.serve import main as serve_main

        fx = _serve_fixture(tmp_path)
        reqs = str(tmp_path / "reqs.jsonl")
        with open(reqs, "w") as f:
            for i, txt in enumerate(["hello", "hello world", "hello world nice day"]):
                r = {"id": f"r{i}", "text": txt, "wavs_dir": fx["prompts"]}
                if i == 0:  # one request with an in-context prosody prompt
                    r["prompt_cuts"] = ["c0"]
                f.write(json.dumps(r) + "\n")
            # prompt_speaker form, same bucket as the unprompted "hello
            # world": its group key ties with the unprompted one on the
            # empty cuts tuple (regression: sorting None vs str speaker
            # keys raised TypeError and killed the whole batch run)
            f.write(json.dumps({"id": "r3", "text": "hello world",
                                "wavs_dir": fx["prompts"],
                                "prompt_speaker": "spkA"}) + "\n")
        out_dir = str(tmp_path / "out")

        serve_main([
            "--requests", reqs, "--out_dir", out_dir, "--batch_size", "2",
            "--max_frames", "64", "--buckets", "32,64", "--frames_per_phone", "8",
            "--g_ckpt", fx["g_ck"], "--g_config", fx["gan"],
            "--plm_ckpt", fx["plm_ck"], "--plm_config", fx["plm"],
            "--adm_ckpt", fx["adm_ck"], "--adm_config", fx["adm"],
            "--vocoder", "vocos", "--vocoder_config", fx["voc"],
            "--symbol_table", fx["sym"],
            "--prompt_ds", fx["prompt_ds"], "--prompt_tokens", "16",
        ])
        captured = capsys.readouterr().out.strip().splitlines()
        stats = json.loads(captured[-1])
        assert stats["requests"] == 4
        for i in range(4):
            p = os.path.join(out_dir, f"r{i}.wav")
            assert os.path.exists(p), p
            from megatts2_tpu.utils.audio import load_wav

            y = load_wav(p)
            assert y.size > 0 and np.isfinite(y).all()

    def test_http_serving(self, tmp_path):
        """serve.py --http: live continuous-engine serving — POST two
        /synthesize requests concurrently, get valid WAV bodies back."""
        import io
        import json
        import threading
        import urllib.error
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from scipy.io import wavfile

        from megatts2_tpu.serve import main as serve_main

        fx = _serve_fixture(tmp_path)
        results = {}
        done = threading.Event()

        def ready_cb(server):
            try:
                port = server.server_address[1]

                def post(txt, **extra):
                    req = urllib.request.Request(
                        f"http://127.0.0.1:{port}/synthesize",
                        data=json.dumps(
                            {"text": txt, "wavs_dir": fx["prompts"], **extra}
                        ).encode(),
                        headers={"Content-Type": "application/json"},
                    )
                    with urllib.request.urlopen(req, timeout=300) as r:
                        assert r.headers["Content-Type"] == "audio/wav"
                        return r.read()

                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=60
                ) as r:
                    assert r.read() == b"ok"
                # error paths: unknown route 404, malformed body 400,
                # oversized body 413, unknown prompt speaker 400,
                # missing keys 400 (serving robustness, r3 verdict #9)
                for path, data, want in (
                    ("/nope", None, 404),
                    ("/synthesize", b"not json", 400),
                    ("/synthesize", b"x" * ((1 << 20) + 1), 413),
                    ("/synthesize", json.dumps(
                        {"text": "hello", "wavs_dir": fx["prompts"],
                         "prompt_speaker": "nobody"}).encode(), 400),
                    ("/synthesize", json.dumps({"text": "hello"}).encode(),
                     400),  # no wavs_dir
                ):
                    try:
                        urllib.request.urlopen(
                            urllib.request.Request(
                                f"http://127.0.0.1:{port}{path}",
                                data=data, method="POST" if data else "GET",
                            ),
                            timeout=60,
                        )
                        raise AssertionError(f"{path} should have errored")
                    except urllib.error.HTTPError as e:
                        assert e.code == want, (path, e.code)
                with ThreadPoolExecutor(2) as ex:
                    # one plain + one with an in-context prosody prompt
                    futs = [ex.submit(post, "hello world"),
                            ex.submit(post, "nice day", prompt_cuts=["c0"])]
                    for i, fut in enumerate(futs):
                        results[i] = fut.result()
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/metrics", timeout=60
                ) as r:
                    m = json.loads(r.read())
                    assert m["served"] == 2 and m["in_flight"] == 0
                    assert m["audio_seconds"] > 0 and m["engine_ticks"] > 0
            finally:
                done.set()
                server.shutdown()

        import megatts2_tpu.serve as serve_mod

        orig = serve_mod.run_http
        serve_mod.run_http = lambda args, tts: orig(args, tts, _ready_cb=ready_cb)
        try:
            serve_main([
                "--http", "0", "--slots", "2", "--max_frames", "64",
                "--chunk_frames", "32",
                "--g_ckpt", fx["g_ck"], "--g_config", fx["gan"],
                "--plm_ckpt", fx["plm_ck"], "--plm_config", fx["plm"],
                "--adm_ckpt", fx["adm_ck"], "--adm_config", fx["adm"],
                "--vocoder", "vocos", "--vocoder_config", fx["voc"],
                "--symbol_table", fx["sym"],
                "--prompt_ds", fx["prompt_ds"], "--prompt_tokens", "16",
            ])
        finally:
            serve_mod.run_http = orig
        assert done.is_set() and len(results) == 2
        for i in (0, 1):
            sr, data = wavfile.read(io.BytesIO(results[i]))
            assert sr == 16000 and data.size > 0


class TestPromptResolverConcurrency:
    """make_prompt_resolver is called from ThreadingHTTPServer handler
    threads; the round-3 advisor flagged the unlocked LRU (KeyError on
    racing eviction, duplicated resolves), and the round-4 review flagged
    the fix's head-of-line blocking (global lock held across the disk
    resolve).  These tests pin the final design: per-key dedupe via an
    Event, cache hits never waiting behind an unrelated slow resolve."""

    def _make(self, monkeypatch, resolve_stub):
        import types

        import megatts2_tpu.data as data_mod
        from megatts2_tpu.serve import make_prompt_resolver

        monkeypatch.setattr(data_mod, "load_prompt_manifest", lambda ds: None)
        monkeypatch.setattr(data_mod, "resolve_prompt", resolve_stub)
        args = types.SimpleNamespace(prompt_ds="x", prompt_n=2)
        return make_prompt_resolver(args)

    def test_concurrent_same_key_resolves_once(self, monkeypatch):
        import threading
        import time

        calls = []
        mu = threading.Lock()

        def stub(ds, cut_ids=None, speaker=None, n=0, manifest=None):
            with mu:
                calls.append(speaker)
            time.sleep(0.05)
            return (np.zeros((4, 8), np.float32), np.zeros((4,), np.int32))

        resolver = self._make(monkeypatch, stub)
        errs = []

        def worker():
            try:
                out = resolver({"prompt_speaker": "spkA"})
                assert out[0].shape == (4, 8)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=worker) for _ in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs
        assert len(calls) == 1  # 7 followers waited on the leader's Event

    def test_cache_hit_not_blocked_by_slow_resolve(self, monkeypatch):
        # Ordering gate, not a wall-clock bound (a dt<0.5s assertion flaked
        # under parallel CI load on this 1-core host — advisor r4): the slow
        # resolve blocks on an Event the main thread sets only AFTER the
        # cache hit returns.  If a cache hit were serialized behind the
        # in-flight resolve, the wait times out and `ordered` records False.
        import threading

        release = threading.Event()
        slow_started = threading.Event()
        ordered = []

        def stub(ds, cut_ids=None, speaker=None, n=0, manifest=None):
            if speaker == "slow":
                slow_started.set()
                ordered.append(release.wait(timeout=30.0))
            return (np.zeros((2, 4), np.float32), np.zeros((2,), np.int32))

        resolver = self._make(monkeypatch, stub)
        resolver({"prompt_speaker": "fast"})  # warm the cache

        t = threading.Thread(target=resolver, args=({"prompt_speaker": "slow"},))
        t.start()
        assert slow_started.wait(timeout=30.0)  # the slow resolve is in flight
        out = resolver({"prompt_speaker": "fast"})
        release.set()  # the cache hit returned while "slow" was still blocked
        t.join()
        assert out[0].shape == (2, 4)
        assert ordered == [True], (
            "cache hit blocked behind an unrelated in-flight resolve"
        )

    def test_eviction_hammering_no_keyerror(self, monkeypatch):
        import threading

        def stub(ds, cut_ids=None, speaker=None, n=0, manifest=None):
            return (np.zeros((1, 2), np.float32), np.zeros((1,), np.int32))

        resolver = self._make(monkeypatch, stub)
        errs = []

        def worker(base):
            try:
                for i in range(120):  # > max_entries/2 distinct keys/thread
                    out = resolver({"prompt_speaker": f"s{base}_{i}"})
                    assert out is not None
                    resolver({"prompt_speaker": "shared"})
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=worker, args=(b,)) for b in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs
