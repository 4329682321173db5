"""Training CLI — one entry point for all three stages.

Replaces the reference's LightningCLI with a hardcoded trainer class the
user must edit per stage (``cli.py:9-10``): here the stage is selected by
``--stage {gan,plm,adm}`` (or inferred from the config's model key), and
YAML configs keep the reference's knob names (see ``config.py``).

    python -m megatts2_tpu.cli fit --config configs/config_gan.yaml --stage gan
"""
from __future__ import annotations

import argparse
import os

import jax
import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="megatts2_tpu training")
    p.add_argument("command", choices=["fit"], help="train a stage")
    p.add_argument("--config", "-c", required=True)
    p.add_argument("--stage", choices=["gan", "plm", "adm", "vocoder"], default=None)
    p.add_argument("--ckpt_path", default=None, help="resume from orbax checkpoint")
    p.add_argument("--init_from_torch", default=None,
                   help="reference Lightning .ckpt to initialize model weights"
                        " (G+D for gan, plm/adm otherwise; optimizer fresh)")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--trace_dir", default=None, help="jax.profiler trace output")
    p.add_argument("--n_model", type=int, default=1, help="tensor-parallel axis size")
    p.add_argument("--zero_opt", action="store_true",
                   help="ZeRO-1: shard optimizer moments of replicated "
                        "params over the data axis (memory ↓ at scale)")
    p.add_argument("--hifigan_ckpt", default=None,
                   help="torch HiFi-GAN ckpt for vocoded validation audio")
    return p.parse_args(argv)


def infer_stage(config_path: str) -> str:
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    model = cfg.get("model", {})
    for key in ("G", "plm", "adm", "vocoder"):
        if key in model:
            return {"G": "gan", "plm": "plm", "adm": "adm", "vocoder": "vocoder"}[key]
    raise ValueError("cannot infer stage from config; pass --stage")



def _maybe_restore(state, ckpt_path, ckpt_dir, mesh, zero=False):
    """Restore the latest (or given) checkpoint, then place the state on
    the mesh: params TP-sharded per parallel/sharding.py rules, optimizer
    moments following their params (``--zero_opt``: ZeRO-1 over the data
    axis), rest replicated.  Placement is also required with no checkpoint
    — create_*_state commits to one device, which would clash with
    mesh-sharded batches (and without TP placement ``--n_model`` would
    silently train pure-DP)."""
    from .parallel import place_train_state
    from .training.checkpoints import latest_checkpoint, restore_checkpoint

    path = ckpt_path or latest_checkpoint(ckpt_dir)
    if path:
        state = restore_checkpoint(path, state)
    return place_train_state(state, mesh, zero=zero)


def _data_cfg(config_path: str) -> dict:
    with open(config_path) as f:
        return yaml.safe_load(f).get("data", {})


def main(argv=None):
    from . import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    stage = args.stage or infer_stage(args.config)
    ckpt_dir = args.ckpt_dir or os.path.join("checkpoints", stage)

    from .data import (
        ADMBatchBuilder,
        CutManifest,
        DataLoader,
        DurationBucketSampler,
        GANBatchBuilder,
        PLMBatchBuilder,
        VocoderBatchBuilder,
    )
    from .parallel import make_mesh, maybe_initialize_distributed
    from .training import run_training

    dcfg = _data_cfg(args.config)
    ds_path = dcfg.get("ds_path", "data/ds/")
    min_d, max_d = dcfg.get("min_duration", 1.5), dcfg.get("max_duration", 20)
    manifests = {
        split: CutManifest.load(os.path.join(ds_path, f"cuts_{split}.jsonl.gz"))
        .filter_duration(min_d, max_d)
        for split in ("train", "valid")
    }
    maybe_initialize_distributed()
    mesh = make_mesh(n_model=args.n_model)

    def loaders(builder_cls, sampler_kwargs, builder_kwargs=None):
        def factory(split):
            def make(epoch):
                sampler = DurationBucketSampler(
                    manifests[split],
                    batch_divisor=mesh.shape["data"],
                    **sampler_kwargs,
                )
                sampler.set_epoch(epoch)
                kw = dict(builder_kwargs or {})
                if builder_cls is not ADMBatchBuilder:
                    kw.setdefault("seed", epoch)  # fresh same-spk sampling per epoch
                builder = builder_cls(manifests[split], ds_path, **kw)
                return DataLoader(sampler, builder)

            return make

        return factory("train"), factory("valid")

    if stage == "gan":
        from .config import load_gan_config
        from .training import create_gan_state, make_gan_eval_step, make_gan_train_step

        g_cfg, d_cfg, tcfg = load_gan_config(args.config)
        rng = jax.random.PRNGKey(tcfg.seed)
        train_f, valid_f = loaders(
            GANBatchBuilder,
            dict(
                max_duration_batch=dcfg.get("max_duration_batch", 60),
                num_buckets=dcfg.get("num_buckets", 10),
            ),
            # max_timbre_frames caps the same-speaker timbre-concat bucket
            # (reference default 2048 == 10 × ~20 s; on the axon remote
            # compiler the 2048-frame bucket at B≥8 trips an int32-overflow
            # CHECK — llo::CouldLeS32, a compiler bug — so drives on this
            # target set 512; see BENCHMARKS.md "Input pipeline")
            dict(max_timbre_frames=dcfg.get("max_timbre_frames", 2048)),
        )
        example = next(iter(train_f(0)))
        state, g_tx, d_tx = create_gan_state(rng, g_cfg, d_cfg, tcfg, example)
        if args.init_from_torch:
            from .training.convert import init_gan_state_from_torch

            state = init_gan_state_from_torch(state, args.init_from_torch, g_cfg, d_cfg)
        state = _maybe_restore(state, args.ckpt_path, ckpt_dir, mesh, zero=args.zero_opt)
        step_fn = make_gan_train_step(g_cfg, d_cfg, tcfg, g_tx, d_tx)
        eval_fn = make_gan_eval_step(g_cfg)
        from .training.gan_trainer import make_gan_val_artifacts

        hifi_params = None
        if args.hifigan_ckpt:
            from .config import HiFiGANConfig
            from .training.convert import convert_hifigan, load_torch_state_dict

            hifi_params = convert_hifigan(
                load_torch_state_dict(args.hifigan_ckpt), HiFiGANConfig()
            )
        artifact_fn = make_gan_val_artifacts(
            g_cfg, os.path.join(args.log_dir, "val_artifacts"), hifi_params
        )
        run_training(
            "gan", state, step_fn, train_f, tcfg.max_steps,
            log_dir=args.log_dir, ckpt_dir=ckpt_dir,
            log_every=tcfg.log_every_n_steps, val_every=tcfg.val_check_interval,
            save_every_n_vals=tcfg.save_every_n_vals,
            eval_step=lambda s, b: {"loss_re": eval_fn(s, b)["loss_re"]},
            valid_loader_factory=valid_f, mesh=mesh, trace_dir=args.trace_dir,
            artifact_fn=artifact_fn, monitor="loss_re",
        )
    elif stage == "plm":
        from .config import load_plm_config
        from .training import create_plm_state, make_plm_train_step

        cfg, tcfg = load_plm_config(args.config)
        rng = jax.random.PRNGKey(tcfg.seed)
        train_f, valid_f = loaders(
            PLMBatchBuilder,
            dict(max_duration_batch=None, max_cuts=dcfg.get("max_n_cuts", 15), num_buckets=1),
            dict(vq_bins=cfg.vq_bins),
        )
        example = next(iter(train_f(0)))
        state, tx = create_plm_state(rng, cfg, tcfg, example)
        if args.init_from_torch:
            from .training.convert import init_lm_state_from_torch

            state = init_lm_state_from_torch(state, args.init_from_torch, cfg, "plm")
        state = _maybe_restore(state, args.ckpt_path, ckpt_dir, mesh, zero=args.zero_opt)
        step_fn, eval_fn = make_plm_train_step(cfg, tcfg, tx)
        run_training(
            "plm", state, step_fn, train_f, tcfg.max_steps,
            log_dir=args.log_dir, ckpt_dir=ckpt_dir,
            log_every=tcfg.log_every_n_steps, val_every=tcfg.val_check_interval,
            save_every_n_vals=tcfg.save_every_n_vals,
            eval_step=eval_fn, valid_loader_factory=valid_f, mesh=mesh,
            trace_dir=args.trace_dir,
        )
    elif stage == "vocoder":
        from .config import load_vocoder_config
        from .training import (
            create_vocoder_state,
            make_vocoder_eval_step,
            make_vocoder_train_step,
        )

        voc_cfg, d_cfg, tcfg = load_vocoder_config(args.config)
        rng = jax.random.PRNGKey(tcfg.seed)
        train_f, valid_f = loaders(
            VocoderBatchBuilder,
            dict(max_duration_batch=None, max_cuts=dcfg.get("batch_size", 16),
                 num_buckets=1),
            dict(segment_frames=tcfg.segment_frames),
        )
        example = next(iter(train_f(0)))
        state, g_tx, d_tx = create_vocoder_state(rng, voc_cfg, d_cfg, tcfg, example)
        state = _maybe_restore(state, args.ckpt_path, ckpt_dir, mesh, zero=args.zero_opt)
        step_fn = make_vocoder_train_step(voc_cfg, d_cfg, tcfg, g_tx, d_tx)
        eval_fn = make_vocoder_eval_step(voc_cfg, tcfg)
        run_training(
            "vocoder", state, step_fn, train_f, tcfg.max_steps,
            log_dir=args.log_dir, ckpt_dir=ckpt_dir,
            log_every=tcfg.log_every_n_steps, val_every=tcfg.val_check_interval,
            save_every_n_vals=tcfg.save_every_n_vals,
            eval_step=lambda s, b: {"loss": eval_fn(s, b)["loss"]},
            valid_loader_factory=valid_f, mesh=mesh, trace_dir=args.trace_dir,
        )
    else:  # adm
        from .config import load_adm_config
        from .training import create_adm_state, make_adm_train_step

        cfg, tcfg = load_adm_config(args.config)
        rng = jax.random.PRNGKey(tcfg.seed)
        train_f, valid_f = loaders(
            ADMBatchBuilder,
            dict(
                max_duration_batch=dcfg.get("max_duration_batch", 400),
                num_buckets=dcfg.get("num_buckets", 10),
            ),
            dict(max_duration_token=cfg.max_duration_token),
        )
        example = next(iter(train_f(0)))
        state, tx = create_adm_state(rng, cfg, tcfg, example)
        if args.init_from_torch:
            from .training.convert import init_lm_state_from_torch

            state = init_lm_state_from_torch(state, args.init_from_torch, cfg, "adm")
        state = _maybe_restore(state, args.ckpt_path, ckpt_dir, mesh, zero=args.zero_opt)
        step_fn, eval_fn = make_adm_train_step(cfg, tcfg, tx)
        run_training(
            "adm", state, step_fn, train_f, tcfg.max_steps,
            log_dir=args.log_dir, ckpt_dir=ckpt_dir,
            log_every=tcfg.log_every_n_steps, val_every=tcfg.val_check_interval,
            save_every_n_vals=tcfg.save_every_n_vals,
            eval_step=eval_fn, valid_loader_factory=valid_f, mesh=mesh,
            trace_dir=args.trace_dir,
        )


if __name__ == "__main__":
    main()
