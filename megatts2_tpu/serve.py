"""Batch-synthesis serving CLI.

Production driver for throughput synthesis (the v5e-8 layout: utterances
sharded over the mesh's data axis, per-chip KV caches).  Reads a JSONL
manifest of requests, LENGTH-BUCKETS them (estimated frames =
``--frames_per_phone`` × phone count, rounded up to the next of
``--buckets``), groups into fixed-size batches per (prompt, bucket), runs
the jitted cascade per bucket, writes wavs, and reports throughput.  Short
requests then pay a short AR scan + vocoder instead of the global
worst-case budget (mixed-length traffic ≈ the reference's dynamic-batching
intent, modules/datamodule.py:346-366, with TPU-static shapes).

    python -m megatts2_tpu.serve --requests reqs.jsonl --out_dir out/ \
        --g_ckpt ... --plm_ckpt ... --adm_ckpt ... --symbol_table ...

Request line: {"id": "u1", "text": "...", "wavs_dir": "prompts/spk1"}
(requests with the same wavs_dir share the prompt-mel computation).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time
from collections import OrderedDict, defaultdict

import numpy as np


def pick_bucket(n_phones: int, frames_per_phone: float, buckets: list) -> int:
    """Smallest bucket covering the estimated frame budget (last = cap)."""
    est = n_phones * frames_per_phone
    for b in buckets:
        if est <= b:
            return b
    return buckets[-1]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="megatts2_tpu batch serving")
    p.add_argument("--requests", default=None,
                   help="JSONL of {id, text, wavs_dir} (batch modes)")
    p.add_argument("--out_dir", default=None, help="wav output dir (batch modes)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=1024)
    p.add_argument("--buckets", default="256,512,1024,2048",
                   help="comma-separated frame buckets for length grouping")
    p.add_argument("--frames_per_phone", type=float, default=16.0,
                   help="frame-budget estimate per phone (conservative; a "
                        "request whose true duration exceeds its bucket is "
                        "truncated at the bucket, same as --max_frames today)")
    p.add_argument("--n_model", type=int, default=1)
    p.add_argument("--g_ckpt", default=None)
    p.add_argument("--g_config", default="configs/config_gan.yaml")
    p.add_argument("--plm_ckpt", default=None)
    p.add_argument("--plm_config", default="configs/config_plm.yaml")
    p.add_argument("--adm_ckpt", default=None)
    p.add_argument("--adm_config", default="configs/config_adm.yaml")
    p.add_argument("--hifigan_ckpt", default=None)
    p.add_argument("--vocoder", choices=["hifigan", "vocos"], default="hifigan",
                   help="vocos = fast iSTFT vocoder family (models/vocos.py)")
    p.add_argument("--vocoder_ckpt", default=None,
                   help="orbax dir from the cli 'vocoder' training stage")
    p.add_argument("--vocoder_config", default="configs/config_vocoder.yaml")
    p.add_argument("--symbol_table", default="data/ds/unique_text_tokens.k2symbols")
    p.add_argument("--pinyin_dict", default=None)
    p.add_argument("--quant_int8", action="store_true",
                   help="int8 weight-only PLM decode (1.6x the AR scan; "
                        "tiny logit perturbation — serving-only deviation, "
                        "see PARITY.md)")
    p.add_argument("--plm_temperature", type=float, default=0.0,
                   help=">0: sample prosody codes instead of greedy argmax")
    p.add_argument("--plm_top_k", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="run a live HTTP server instead of batch mode: "
                        "POST /synthesize {text, wavs_dir} -> audio/wav; "
                        "requests are admitted into the continuous engine "
                        "while it runs (iteration-level scheduling)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--continuous", action="store_true",
                   help="continuous-batching engine (slot-based; admits "
                        "requests at chunk boundaries).  For ONLINE traffic "
                        "(arrivals over time, --http) — first-come slots, no "
                        "batch barriers; for offline request files the "
                        "default bucketed mode has higher throughput "
                        "(BENCHMARKS.md)")
    p.add_argument("--slots", type=int, default=8,
                   help="concurrent decode slots for --continuous")
    p.add_argument("--chunk_frames", type=int, default=128,
                   help="emit granularity for --continuous")
    p.add_argument("--prompt_ds", default=None,
                   help="prepare_ds root with stage-2 latents/ — enables "
                        "in-context prosody prompting; requests may then "
                        "carry prompt_cuts: [ids] or prompt_speaker")
    p.add_argument("--prompt_tokens", type=int, default=256,
                   help="static prosody-prompt token budget (prompts are "
                        "tiled + tail-truncated to this length)")
    p.add_argument("--prompt_n", type=int, default=3,
                   help="utterances per speaker prompt (prompt_speaker)")
    p.add_argument("--request_timeout", type=float, default=600.0,
                   help="seconds an HTTP request waits for synthesis "
                        "before a 504 (its slot entry is dropped)")
    p.add_argument("--max_body_bytes", type=int, default=1 << 20,
                   help="reject HTTP bodies above this size with 413")
    p.add_argument("--admit_tp_bucket", type=int, default=0,
                   help=">0: continuous engine pads every admission to "
                        "this static phone bucket and fuses content prep "
                        "+ prompt prefill + slot install into ONE "
                        "dispatch (offline throughput)")
    return p.parse_args(argv)


def make_prompt_resolver(args):
    """request dict → (tc, codes) or None, memoized by cut-id tuple.
    Requests select the prompt with ``prompt_cuts`` (explicit ids) or
    ``prompt_speaker`` (first --prompt_n cuts of that speaker)."""
    if args.prompt_ds is None:
        def no_prompt(r):
            if r.get("prompt_cuts") or r.get("prompt_speaker"):
                raise ValueError("request has a prosody prompt but the "
                                 "server was started without --prompt_ds")
            return None
        return no_prompt
    import threading

    from .data import load_prompt_manifest, resolve_prompt

    manifest = load_prompt_manifest(args.prompt_ds)
    # LRU-bounded: each entry holds (P,D)+(P,) arrays (~0.5 MB at
    # P=2048), and the HTTP server lives for days — unbounded growth
    # with distinct (cuts, speaker) keys would leak RSS monotonically.
    # The resolver is called from ThreadingHTTPServer handler threads:
    # dict mutation happens under one lock, but the expensive disk
    # resolve runs OUTSIDE it behind a per-key Event — concurrent
    # requests on the same new key dedupe (followers wait on the event),
    # while requests on other keys (including cache hits) never block
    # behind an unrelated multi-second resolve.
    cache = OrderedDict()
    pending: dict = {}  # key -> threading.Event, set when resolve lands
    max_entries = 128
    mu = threading.Lock()

    def resolver(r):
        ids = tuple(r.get("prompt_cuts") or ())
        spk = r.get("prompt_speaker")
        if not ids and not spk:
            return None
        key = (ids, spk)
        while True:
            with mu:
                if key in cache:
                    cache.move_to_end(key)
                    return cache[key]
                ev = pending.get(key)
                if ev is None:
                    ev = pending[key] = threading.Event()
                    leader = True
                else:
                    leader = False
            if not leader:
                ev.wait()
                continue  # re-check the cache (or re-lead if it errored)
            try:
                val = resolve_prompt(
                    args.prompt_ds, cut_ids=list(ids) or None, speaker=spk,
                    n=args.prompt_n, manifest=manifest,
                )
                with mu:
                    cache[key] = val
                    while len(cache) > max_entries:
                        cache.popitem(last=False)
                return val
            finally:
                with mu:
                    pending.pop(key, None)
                ev.set()

    return resolver


def run_http(args, tts, _ready_cb=None):
    """Live HTTP serving on the continuous-batching engine.

    ``POST /synthesize`` with JSON ``{"text": ..., "wavs_dir": ...}``
    returns ``audio/wav`` bytes; ``GET /healthz`` returns 200.  Requests
    are admitted into free engine slots at the next tick boundary while
    other requests keep decoding — LLM-server iteration-level scheduling
    for the TTS cascade (continuous.py).  No reference counterpart (the
    reference has no serving at all).

    ``_ready_cb(server)`` is a test hook called once the socket is bound
    (the test drives requests then shuts the server down)."""
    import queue as qmod
    import threading
    import uuid
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import jax.numpy as jnp

    from . import HIFIGAN_SR
    from .continuous import ContinuousEngine
    from .ops import mel_spectrogram
    from .utils.audio import load_wav, peak_normalize, wav_bytes

    eng = ContinuousEngine(
        tts.g_vars, tts.plm_params, tts.adm_params, tts.hifi_params,
        tts.g_cfg, tts.plm_cfg, tts.adm_cfg, tts.hifi_cfg,
        slots=args.slots, max_frames=args.max_frames,
        chunk_frames=args.chunk_frames, dtype=tts.dtype,
        quant=args.quant_int8,
        prompt_tokens=args.prompt_tokens if args.prompt_ds else 0,
        admit_tp_bucket=args.admit_tp_bucket,
    )
    prompt_of = make_prompt_resolver(args)
    rq: "qmod.Queue" = qmod.Queue()
    stop = threading.Event()
    results = {}
    results_mu = threading.Lock()
    prompt_cache = {}
    prompt_mu = threading.Lock()

    def prompt_mel(wavs_dir):
        with prompt_mu:
            if wavs_dir not in prompt_cache:
                mels = [
                    np.asarray(mel_spectrogram(
                        jnp.asarray(peak_normalize(load_wav(w, HIFIGAN_SR)))
                    ))
                    for w in sorted(glob.glob(os.path.join(wavs_dir, "*.wav")))
                ]
                if not mels:
                    raise FileNotFoundError(f"no *.wav under {wavs_dir}")
                prompt_cache[wavs_dir] = np.concatenate(mels, axis=0)
            return prompt_cache[wavs_dir]

    stats = {"served": 0, "audio_s": 0.0, "started": time.time()}

    def engine_loop():
        for rid, wav in eng.run_live(rq, stop):
            stats["served"] += 1
            stats["audio_s"] += wav.shape[0] / 16000.0
            with results_mu:
                entry = results.get(rid)
                if entry is None:
                    continue  # client timed out and dropped the slot
                results[rid] = (entry[0], wav)
            entry[0].set()

    eng_thread = threading.Thread(target=engine_loop, daemon=True)
    eng_thread.start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
            elif self.path == "/metrics":
                up = max(time.time() - stats["started"], 1e-9)
                with results_mu:
                    in_flight = len(results)
                body = json.dumps({
                    "served": stats["served"],
                    "audio_seconds": round(stats["audio_s"], 2),
                    "in_flight": in_flight,
                    "queue_depth": rq.qsize(),
                    "engine_ticks": eng.n_ticks,
                    "uptime_s": round(up, 1),
                    "utt_per_sec": round(stats["served"] / up, 3),
                    "slots": args.slots,
                    "slots_busy": eng.slots_busy,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/synthesize":
                return self.send_error(404)
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                return self.send_error(400, "bad Content-Length")
            if n > args.max_body_bytes:
                # Drain (bounded) before replying: closing the socket with
                # an unread upload in flight RSTs the connection and the
                # client never sees the 413, only a reset mid-upload.
                remaining = min(n, 8 * args.max_body_bytes)
                while remaining > 0:
                    chunk = self.rfile.read(min(remaining, 1 << 16))
                    if not chunk:
                        break
                    remaining -= len(chunk)
                self.close_connection = True
                return self.send_error(413, "request body too large")
            try:
                body = json.loads(self.rfile.read(n))
                ids = tts.phone_ids(body["text"])[None]
                req = {
                    "id": uuid.uuid4().hex,
                    "phone": ids,
                    "lens": np.array([ids.shape[1]], np.int32),
                    "mels_prompt": prompt_mel(body["wavs_dir"])[None],
                }
                pf = prompt_of(body)
                if pf is not None:  # in-context prosody prompt
                    req["prompt_tc"], req["prompt_codes"] = pf
            except Exception as e:
                return self.send_error(400, str(e))
            ev = threading.Event()
            with results_mu:
                results[req["id"]] = (ev, None)
            rq.put(req)
            if not ev.wait(timeout=args.request_timeout):
                with results_mu:  # drop the slot so the table can't leak
                    results.pop(req["id"], None)
                return self.send_error(504, "synthesis timed out")
            with results_mu:
                wav = results.pop(req["id"])[1]
            payload = wav_bytes(wav, HIFIGAN_SR)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    server = ThreadingHTTPServer((args.host, args.http), Handler)
    print(json.dumps({"mode": "http", "host": args.host,
                      "port": server.server_address[1], "slots": args.slots}),
          flush=True)
    if _ready_cb is not None:
        threading.Thread(target=_ready_cb, args=(server,), daemon=True).start()
    try:
        server.serve_forever()
    finally:
        stop.set()
        eng_thread.join(timeout=30)


def main(argv=None):
    from . import HIFIGAN_SR, enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .models import megatts_from_pretrained
    from .ops import mel_spectrogram
    from .parallel import make_mesh
    from .utils.audio import load_wav, peak_normalize, save_wav

    if not (args.g_ckpt and args.plm_ckpt and args.adm_ckpt):
        raise SystemExit("serving requires --g_ckpt/--plm_ckpt/--adm_ckpt")
    tts = megatts_from_pretrained(
        args.g_ckpt, args.g_config, args.plm_ckpt, args.plm_config,
        args.adm_ckpt, args.adm_config, args.symbol_table,
        hifigan_ckpt=args.hifigan_ckpt, vocoder=args.vocoder,
        vocoder_ckpt=args.vocoder_ckpt, vocoder_config=args.vocoder_config,
        pinyin_dict_path=args.pinyin_dict,
        max_frames=args.max_frames, quant_int8=args.quant_int8,
        plm_temperature=args.plm_temperature, plm_top_k=args.plm_top_k,
        seed=args.seed,
    )
    mesh = make_mesh(n_model=args.n_model)
    if args.http is None:
        if not (args.requests and args.out_dir):
            raise SystemExit("batch serving requires --requests/--out_dir")
        os.makedirs(args.out_dir, exist_ok=True)
    if mesh.size > 1:
        # params come off the loaders committed to one device; replicate
        # them across the mesh so the data-sharded batch can address them
        from .parallel import replicated_like

        tts.g_vars = jax.device_put(tts.g_vars, replicated_like(tts.g_vars, mesh))
        tts.plm_params = jax.device_put(
            tts.plm_params, replicated_like(tts.plm_params, mesh)
        )
        tts.adm_params = jax.device_put(
            tts.adm_params, replicated_like(tts.adm_params, mesh)
        )
        tts.hifi_params = jax.device_put(
            tts.hifi_params, replicated_like(tts.hifi_params, mesh)
        )

    buckets = sorted(int(b) for b in args.buckets.split(",") if int(b) <= args.max_frames)
    if not buckets or buckets[-1] < args.max_frames:
        buckets.append(args.max_frames)

    if args.http is not None:
        return run_http(args, tts)

    requests = [json.loads(l) for l in open(args.requests) if l.strip()]

    if args.continuous:
        from .continuous import ContinuousEngine

        prompt_cache = {}

        def prompt_mel(wavs_dir):
            if wavs_dir not in prompt_cache:
                mels = [
                    np.asarray(
                        mel_spectrogram(
                            jnp.asarray(peak_normalize(load_wav(w, HIFIGAN_SR)))
                        )
                    )
                    for w in sorted(glob.glob(os.path.join(wavs_dir, "*.wav")))
                ]
                prompt_cache[wavs_dir] = np.concatenate(mels, axis=0)
            return prompt_cache[wavs_dir]

        prompt_of = make_prompt_resolver(args)
        eng_reqs = []
        for r in requests:
            ids = tts.phone_ids(r["text"])[None]
            req = {
                "id": r["id"],
                "phone": ids,
                "lens": np.array([ids.shape[1]], np.int32),
                "mels_prompt": prompt_mel(r["wavs_dir"])[None],
            }
            pf = prompt_of(r)
            if pf is not None:
                req["prompt_tc"], req["prompt_codes"] = pf
            eng_reqs.append(req)
        eng = ContinuousEngine(
            tts.g_vars, tts.plm_params, tts.adm_params, tts.hifi_params,
            tts.g_cfg, tts.plm_cfg, tts.adm_cfg, tts.hifi_cfg,
            slots=args.slots, max_frames=args.max_frames,
            chunk_frames=args.chunk_frames, dtype=tts.dtype,
            quant=args.quant_int8,
            prompt_tokens=args.prompt_tokens if args.prompt_ds else 0,
            admit_tp_bucket=args.admit_tp_bucket,
        )
        t0 = time.time()
        done, audio_s = 0, 0.0
        for rid, wav in eng.run(eng_reqs):
            save_wav(os.path.join(args.out_dir, f"{rid}.wav"), wav)
            audio_s += wav.shape[0] / HIFIGAN_SR
            done += 1
        dt = time.time() - t0
        print(json.dumps({
            "mode": "continuous", "slots": args.slots, "requests": done,
            "wall_s": round(dt, 2), "utt_per_sec": round(done / dt, 2),
            "audio_s": round(audio_s, 1), "rtf": round(dt / max(audio_s, 1e-9), 4),
        }))
        return

    prompt_of = make_prompt_resolver(args)
    # (wavs_dir, frame bucket, prosody-prompt key) -> requests; requests
    # sharing a prompt batch together (the prompt is one static-length
    # prefix broadcast over the batch, see plm_infer)
    by_group = defaultdict(list)
    for r in requests:
        bucket = pick_bucket(
            len(tts.phone_ids(r["text"])), args.frames_per_phone, buckets
        )
        # "" stands in for absent prompt_speaker so mixed prompted /
        # unprompted groups stay sortable (None < str raises TypeError)
        pkey = (tuple(r.get("prompt_cuts") or ()),
                r.get("prompt_speaker") or "")
        by_group[(r["wavs_dir"], bucket, pkey)].append(r)

    t0 = time.time()
    done = 0
    audio_s = 0.0
    prompt_cache = {}
    for (wavs_dir, bucket, _pkey), reqs in sorted(by_group.items()):
        if wavs_dir not in prompt_cache:
            mels = []
            for w in sorted(glob.glob(os.path.join(wavs_dir, "*.wav"))):
                y = peak_normalize(load_wav(w, HIFIGAN_SR))
                mels.append(np.asarray(mel_spectrogram(jnp.asarray(y))))
            prompt_cache[wavs_dir] = np.concatenate(mels, axis=0)
        mel_prompt = prompt_cache[wavs_dir]
        pf = prompt_of(reqs[0])
        if pf is not None:
            # fit to ONE static token length so the jit cache stays bounded
            from .data import fit_prompt

            pf = fit_prompt(pf[0], pf[1], args.prompt_tokens)
        for i in range(0, len(reqs), args.batch_size):
            chunk = reqs[i : i + args.batch_size]
            # pad the final chunk so the jit shape stays fixed
            pad = args.batch_size - len(chunk)
            texts = [r["text"] for r in chunk] + [chunk[-1]["text"]] * pad
            prompts = np.broadcast_to(
                mel_prompt[None], (len(texts),) + mel_prompt.shape
            )
            wavs = tts.synthesize_batch(
                texts, prompts, mesh=mesh, max_frames=bucket,
                prompt_features=pf,
            )
            for r, wav in zip(chunk, wavs):
                save_wav(os.path.join(args.out_dir, f"{r['id']}.wav"), wav)
                audio_s += wav.shape[0] / HIFIGAN_SR
                done += 1
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "requests": done,
                "wall_s": round(dt, 2),
                "utt_per_sec": round(done / dt, 2),
                "audio_s": round(audio_s, 1),
                "rtf": round(dt / max(audio_s, 1e-9), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
