"""Runnable end-to-end smoke of the whole framework on CPU (no data or
checkpoints needed): builds a synthetic 2-speaker corpus, runs prepare_ds
stages 0+1, trains the VQ-GAN for 3 steps (orbax checkpoint + metrics +
validation artifacts), extracts stage-2 latents from that checkpoint, then
trains ADM and PLM.  ~2-4 minutes on a laptop-class CPU.

    python examples/pipeline_smoke.py
"""
import os, sys, time, tempfile, shutil

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from megatts2_tpu.utils.audio import save_wav

t0 = time.time()
def mark(s): print(f"[{time.time()-t0:.1f}s] {s}", flush=True)

root = tempfile.mkdtemp(prefix="megatts_pipe_")
wavs = os.path.join(root, "wavs"); tgs = os.path.join(root, "textgrids")
ds = os.path.join(root, "ds")
os.makedirs(ds)

WORDS = ["hello", "world", "nice", "day"]
rng = np.random.RandomState(0)
for spk in ("spkA", "spkB"):
    os.makedirs(os.path.join(wavs, spk))
    os.makedirs(os.path.join(tgs, spk))
    for i in range(4):
        y = (0.2 * np.sin(2 * np.pi * (150 + 40 * i) * np.arange(16000) / 16000)
             + 0.02 * rng.randn(16000)).astype(np.float32)
        uid = f"{spk}_u{i}"
        save_wav(os.path.join(wavs, spk, uid + ".wav"), y)
        open(os.path.join(wavs, spk, uid + ".txt"), "w").write("hello world nice day")
        # TextGrid: 4 phones of 0.25s
        iv = []
        for j, w in enumerate(WORDS):
            iv.append(f"""        intervals [{j+1}]:
            xmin = {j*0.25}
            xmax = {(j+1)*0.25}
            text = "{w}"
""")
        open(os.path.join(tgs, spk, uid + ".TextGrid"), "w").write(
            'File type = "ooTextFile"\nObject class = "TextGrid"\n'
            "xmin = 0\nxmax = 1.0\ntiers? <exists>\nsize = 1\nitem []:\n"
            "    item [1]:\n"
            '        class = "IntervalTier"\n        name = "phones"\n'
            "        xmin = 0\n        xmax = 1.0\n        intervals: size = 4\n"
            + "".join(iv)
        )
mark("synthetic corpus written")

from megatts2_tpu.prepare_ds import main as prep_main
prep_main(["--stage", "0", "--wavtxt_path", wavs, "--num_workers", "2"])
lab = open(os.path.join(wavs, "spkA", "spkA_u0.lab")).read()
assert lab == "hello _ world _ nice _ day", lab
mark(f"stage 0 ok: lab = {lab!r}")

prep_main(["--stage", "1", "--wavtxt_path", wavs, "--text_grid_path", tgs,
           "--ds_path", ds, "--test_set_ratio", "0.5"])
from megatts2_tpu.data import CutManifest
mt = CutManifest.load(os.path.join(ds, "cuts_train.jsonl.gz"))
mv = CutManifest.load(os.path.join(ds, "cuts_valid.jsonl.gz"))
assert len(mt) + len(mv) == 8, (len(mt), len(mv))
c = mt[0]
assert sum(c.duration_tokens) <= c.num_frames
mark(f"stage 1 ok: {len(mt)} train / {len(mv)} valid cuts, durs={c.duration_tokens}")

# --- tiny GAN training via the CLI path --------------------------------
cfg_gan = os.path.join(root, "gan.yaml")
open(cfg_gan, "w").write(f"""
trainer:
  max_steps: 3
  log_every_n_steps: 1
  val_check_interval: 2
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
      mel_bins: 20
      stride: 8
      hidden_size: 16
      kernel_size: 3
      n_layers: 1
      n_stacks: 1
      n_blocks: 1
      vq_bins: 32
      vq_dim: 8
    kernel_size: 3
    hidden_size: 16
    decoder_n_stack: 1
    decoder_n_block: 1
    scan_stacks: true
  D:
    time_lengths: [8, 16]
    freq_length: 80
    hidden_size: 8
  initial_learning_rate: 1.0e-4
  warmup_steps: 1
  train_dtype: float32
data:
  ds_path: {ds}/
  max_duration_batch: 30
  min_duration: 0.5
  max_duration: 20
  num_buckets: 1
""")
from megatts2_tpu.cli import main as cli_main
ckdir = os.path.join(root, "ck")
cli_main(["fit", "-c", cfg_gan, "--log_dir", os.path.join(root, "logs"),
          "--ckpt_dir", os.path.join(ckdir, "gan")])
import glob
steps = glob.glob(os.path.join(ckdir, "gan", "step_*"))
assert steps, "no GAN checkpoint written"
mark(f"GAN training ok, ckpts: {[os.path.basename(s) for s in steps]}")
mlog = open(os.path.join(root, "logs", "gan_metrics.jsonl")).read().strip().splitlines()
mark(f"metrics rows: {len(mlog)}; last: {mlog[-1][:160]}")

# --- stage 2: latent extraction from the orbax ckpt --------------------
prep_main(["--stage", "2", "--ds_path", ds,
           "--generator_ckpt", os.path.join(ckdir, "gan"),
           "--generator_config", cfg_gan])
lat = np.load(os.path.join(ds, "latents", "spkA", "spkA_u0.npy"), allow_pickle=True).item()
assert lat["tc_latent"].shape[1] == 4 and lat["tc_latent"].shape[2] == 16, lat["tc_latent"].shape
assert lat["p_code"].shape[0] == 1
mark(f"stage 2 ok: tc_latent {lat['tc_latent'].shape}, p_code {lat['p_code'].shape}")

# --- ADM + PLM training ------------------------------------------------
cfg_adm = os.path.join(root, "adm.yaml")
open(cfg_adm, "w").write(f"""
trainer:
  max_steps: 2
  log_every_n_steps: 1
  val_check_interval: 2
model:
  adm:
    n_layers: 1
    n_heads: 2
    emb_dim: 8
    tc_latent_dim: 16
    tc_emb_dim: 8
    dropout: 0.0
  initial_learning_rate: 1.0e-4
  warmup_steps: 1
  train_dtype: float32
data:
  ds_path: {ds}/
  dataset: MegaADMDataset
  max_duration_batch: 30
  min_duration: 0.5
  max_duration: 20
  num_buckets: 1
""")
cli_main(["fit", "-c", cfg_adm, "--log_dir", os.path.join(root, "logs"),
          "--ckpt_dir", os.path.join(ckdir, "adm")])
mark("ADM training ok")

cfg_plm = os.path.join(root, "plm.yaml")
open(cfg_plm, "w").write(f"""
trainer:
  max_steps: 2
  log_every_n_steps: 1
  val_check_interval: 2
model:
  plm:
    n_layers: 1
    n_heads: 2
    vq_dim: 8
    tc_latent_dim: 16
    vq_bins: 32
    dropout: 0.0
  initial_learning_rate: 1.0e-4
  warmup_steps: 1
  train_dtype: float32
data:
  ds_path: {ds}/
  dataset: MegaPLMDataset
  min_duration: 0.5
  max_duration: 20
  max_n_cuts: 3
""")
cli_main(["fit", "-c", cfg_plm, "--log_dir", os.path.join(root, "logs"),
          "--ckpt_dir", os.path.join(ckdir, "plm")])
mark("PLM training ok")

# --- vocoder training (Vocos family, raw-wav crops) --------------------
cfg_voc = os.path.join(root, "voc.yaml")
open(cfg_voc, "w").write(f"""
trainer:
  max_steps: 2
  log_every_n_steps: 1
  val_check_interval: 2
model:
  vocoder:
    family: vocos
    init_args: {{dim: 16, intermediate_dim: 32, num_layers: 1}}
  D: {{periods: [2], msd_scales: 1, mpd_base_ch: 4, msd_base_ch: 4, max_ch: 8}}
  initial_learning_rate: 1.0e-4
  segment_frames: 8
  train_dtype: float32
data:
  ds_path: {ds}/
  batch_size: 2
  min_duration: 0.5
  max_duration: 20
""")
cli_main(["fit", "-c", cfg_voc, "--log_dir", os.path.join(root, "logs"),
          "--ckpt_dir", os.path.join(ckdir, "vocoder")])
mark("vocoder training ok")

print("PIPELINE PASS; root =", root)
