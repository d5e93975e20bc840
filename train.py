#!/usr/bin/env python
"""Training CLI (parity with ``/root/reference/train.py``).

TPU-native execution model: ONE process per host driving all local chips via
SPMD (jit + NamedShardings over a 1-D 'data' mesh) — replacing the
reference's mp.spawn + DDP + NCCL (``train.py:28-36,285-291``).  Gradient
all-reduce is emitted by XLA over ICI; multi-host runs initialize via
``jax.distributed`` when a coordinator is configured.

Batch semantics match DDP: ``--batch`` is the per-device batch; the global
batch is ``batch * num_devices``.  ``--gpus`` is accepted for script parity
and caps the number of devices used.

Subepoch protocol (``train.py:109-209``): subepochs 0-9 train on dataset
tenths; subepoch 10 is validation for Matterport (InteriorNet/StreetLearn
reset at 10 following Cai et al.).  Checkpoints every 10k steps with
auto-resume from the newest one.
"""

import argparse
import os
from datetime import datetime

import numpy as np

from rel_pose_tpu.config import add_model_flags, model_config_from_args
from rel_pose_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    parser = argparse.ArgumentParser()
    # training (reference flags, train.py:219-231)
    parser.add_argument("--w_tr", type=float, default=10.0)
    parser.add_argument("--w_rot", type=float, default=10.0)
    parser.add_argument("--warmup", type=int, default=10000)
    parser.add_argument("--batch", type=int, default=1,
                        help="per-device batch (DDP semantics)")
    parser.add_argument("--steps", type=int, default=120000)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--clip", type=float, default=2.5)
    parser.add_argument("--weight_decay", type=float, default=1e-5)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--no_ddp", action="store_true", default=False,
                        help="use a single device")
    parser.add_argument("--gpus", type=int, default=None,
                        help="cap on devices used (script parity; default: "
                             "all local devices)")
    parser.add_argument("--ckpt", help="checkpoint to restore (warm start)")
    parser.add_argument("--resnet_pretrained",
                        help="path to torchvision resnet18 weights "
                             "(ImageNet) to initialize the conv trunk for "
                             "a fresh run — the reference's "
                             "models.resnet18(pretrained=True) without "
                             "needing torchvision/network access")
    parser.add_argument("--name", default="bla", help="name your experiment")
    parser.add_argument("--remat", action="store_true", default=False,
                        help="rematerialize the forward in the backward pass "
                             "(larger per-chip batches at ~1.3x step FLOPs)")
    # data
    parser.add_argument("--datapath")
    parser.add_argument("--image_size", default=[384, 512])
    parser.add_argument("--exp")
    parser.add_argument("--use_mini_dataset", action="store_true")
    parser.add_argument("--streetlearn_interiornet_type", default="",
                        choices=("", "T"))
    parser.add_argument("--dataset", default="matterport",
                        choices=("matterport", "interiornet", "streetlearn"))
    parser.add_argument("--ckpt_every", type=int, default=10000)
    add_model_flags(parser)
    args = parser.parse_args()
    print(args)

    import jax
    import jax.numpy as jnp
    from rel_pose_tpu.data import dataset_factory, DataLoader
    from rel_pose_tpu.models import vitess_init
    from rel_pose_tpu.parallel import make_mesh, shard_batch, replicate
    from rel_pose_tpu.parallel.mesh import maybe_init_distributed
    from rel_pose_tpu.train import (
        TrainState, make_optimizer, make_train_step, make_eval_step, Logger,
        save_checkpoint, load_checkpoint, checkpoint_path,
        find_resume_checkpoint, ensure_output_dirs, AsyncCheckpointer,
    )

    maybe_init_distributed()

    cfg = model_config_from_args(args)
    ensure_output_dirs(args.name)

    # args snapshot (train.py:278-283)
    stamp = datetime.now().strftime("%Y-%m-%d_%H-%M")
    with open(f"output/{args.name}/args_{stamp}.txt", "w") as f:
        for k, v in vars(args).items():
            f.write(f"{k}  {v}\n")

    # mesh
    n_dev = 1 if args.no_ddp else (args.gpus or len(jax.devices()))
    mesh = make_mesh(num_devices=n_dev)
    global_batch = args.batch * mesh.size
    print(f"devices: {mesh.size}, per-device batch {args.batch}, "
          f"global batch {global_batch}")

    # model + optimizer
    seed = 0  # reference: torch.manual_seed(0) per rank (train.py:35)
    params, bn_state = vitess_init(jax.random.PRNGKey(seed), cfg)
    tx, schedule = make_optimizer(lr=args.lr, steps=args.steps,
                                  warmup=args.warmup,
                                  weight_decay=args.weight_decay,
                                  clip=args.clip)
    state = TrainState.create(params, bn_state, tx)

    # ImageNet-pretrained trunk for fresh runs (reference src/model.py:31);
    # a restored checkpoint below overrides it, like the reference's
    # load_state_dict over the pretrained resnet
    if args.resnet_pretrained:
        from rel_pose_tpu.utils.convert import load_torchvision_resnet18
        tp, ts = load_torchvision_resnet18(args.resnet_pretrained)
        dt = state.params["resnet"]["conv1"]["w"].dtype
        state = state.replace(
            params=dict(state.params,
                        resnet=jax.tree.map(lambda x: x.astype(dt), tp)),
            bn_state=dict(state.bn_state, resnet=ts))
        print("initialized conv trunk from", args.resnet_pretrained)

    # restore: --ckpt warm start, else auto-resume newest
    resume = find_resume_checkpoint(args.name)
    if args.ckpt is not None:
        print("loading separate checkpoint", args.ckpt)
        if args.ckpt.endswith(".pth"):
            # Reference --ckpt semantics (train.py:75-86): restore model AND
            # Adam moments; scheduler and step count start fresh.
            from rel_pose_tpu.utils.convert import (
                load_torch_checkpoint_with_optimizer)
            from rel_pose_tpu.train.optim import warm_start_adam
            p, s, adam = load_torch_checkpoint_with_optimizer(args.ckpt, cfg)
            state = state.replace(params=p, bn_state=s)
            if adam is not None:
                mu, nu, count = adam
                state = state.replace(opt_state=warm_start_adam(
                    state.opt_state, mu, nu, count))
                print(f"restored torch Adam moments (step {count})")
        else:
            try:
                tree = load_checkpoint(args.ckpt,
                                       jax.tree.map(np.asarray, state))
                state = jax.tree.map(jnp.asarray, tree)
            except Exception:
                # weights-only checkpoint (e.g. from convert_checkpoint.py):
                # warm-start params/BN, fresh optimizer
                from rel_pose_tpu.train.checkpoint import load_params_only
                p, s = load_params_only(args.ckpt, state.params,
                                        state.bn_state)
                state = state.replace(params=jax.tree.map(jnp.asarray, p),
                                      bn_state=jax.tree.map(jnp.asarray, s))
    elif resume is not None:
        print("loading existing checkpoint", resume)
        tree = load_checkpoint(resume, jax.tree.map(np.asarray, state))
        state = jax.tree.map(jnp.asarray, tree)

    state = replicate(mesh, state)
    train_step = make_train_step(cfg, tx, args.w_tr, args.w_rot, mesh=mesh,
                                 remat=args.remat)
    eval_step = make_eval_step(cfg, args.w_tr, args.w_rot, mesh=mesh)

    from rel_pose_tpu.utils.profiling import StepTimer, estimate_step_flops
    logger = Logger(args.name, schedule)
    # MFU: achieved model FLOPs (matmul/conv, fwd+bwd, counted from the
    # abstract trace — no compile) over the chip's peak.  Peak comes from
    # RELPOSE_PEAK_TFLOPS; defaults to the v5e bf16 MXU peak on TPU +
    # bf16, else MFU is omitted rather than guessed.
    peak_env = os.environ.get("RELPOSE_PEAK_TFLOPS")
    if peak_env:
        peak_flops = float(peak_env) * 1e12
    elif (jax.devices()[0].platform == "tpu"
          and cfg.compute_dtype == "bfloat16"):
        peak_flops = 197e12
    else:
        peak_flops = None
    step_flops = None
    if peak_flops:
        from rel_pose_tpu.train.step import make_loss_fn
        lf = make_loss_fn(cfg, args.w_tr, args.w_rot, "train")

        def _step_math(p, b, im, po, ii):
            return jax.value_and_grad(lf, has_aux=True)(p, b, im, po, ii,
                                                        True)

        sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            (state.params, state.bn_state))
        step_flops = estimate_step_flops(
            _step_math, sds[0], sds[1],
            jax.ShapeDtypeStruct((global_batch, 2, 3, 384, 512), jnp.uint8),
            jax.ShapeDtypeStruct((global_batch, 2, 7), jnp.float32),
            jax.ShapeDtypeStruct((global_batch, 2, 4), jnp.float32))
    timer = StepTimer(pairs_per_step=global_batch, num_chips=mesh.size,
                      flops_per_step=step_flops, peak_flops=peak_flops)
    ckpt_writer = AsyncCheckpointer()
    train_steps = int(jax.device_get(state.step))
    subepoch = 0
    epoch_count = 0
    should_keep_training = train_steps < args.steps

    while should_keep_training:
        is_training = subepoch != 10
        train_val = "train" if is_training else "val"

        db = dataset_factory(
            [args.dataset], datapath=args.datapath, subepoch=subepoch,
            is_training=is_training,
            streetlearn_interiornet_type=args.streetlearn_interiornet_type,
            use_mini_dataset=args.use_mini_dataset)
        loader = DataLoader(
            db, batch_size=global_batch // jax.process_count(),
            shuffle=is_training, seed=seed, epoch=epoch_count * 11 + subepoch,
            num_workers=args.num_workers,
            num_shards=jax.process_count(), shard_index=jax.process_index())

        from tqdm import tqdm

        def device_batches(loader):
            """One-batch device prefetch: ``jax.device_put`` is async, so
            issuing batch k+1's host->device copy BEFORE running step k
            overlaps the transfer with compute (the loader's own worker
            threads already prefetch the host side)."""
            prev = None
            for host in loader:
                # hand the host numpy arrays straight to shard_batch: it
                # device_puts single-process and uses
                # make_array_from_process_local_data multi-process; a
                # jnp.asarray here would force a device->host->device round
                # trip per batch on multi-host pods
                dev = shard_batch(mesh, tuple(host))
                if prev is not None:
                    yield prev
                prev = (host, dev)
            if prev is not None:
                yield prev

        def flush_logging(i_batch, metrics, poses_est, poses):
            """Materialize + log one step's (device) metrics on rank 0."""
            if jax.process_index() != 0:
                return
            host_metrics = {k: float(v) for k, v in metrics.items()
                            if k != "loss"}
            if is_training:
                host_metrics["pairs_per_sec_per_chip"] = \
                    timer.pairs_per_sec_per_chip
                if timer.mfu is not None:
                    host_metrics["mfu"] = timer.mfu
            logger.push(host_metrics)
            if i_batch % 20 == 0:
                np.set_printoptions(suppress=True, linewidth=150)
                print("\n estimated pose")
                print(np.asarray(poses_est[0]))
                print("ground truth pose")
                print(np.asarray(poses[0]))
            if (i_batch + 10) % 20 == 0:
                print("\n metrics:",
                      {k: float(v) for k, v in metrics.items()}, "\n")
            if i_batch % 100 == 0:
                print(f"epoch {epoch_count}\nsubepoch: {subepoch}\n"
                      f"using {train_val} set")

        # one-step delayed metric materialization: float()ing step k's
        # metrics right after dispatching step k would drain the device
        # queue every step; logging them AFTER step k+1 is dispatched keeps
        # the device busy while the host blocks on step k's values
        pending_log = None
        for i_batch, (host_batch, batch) in enumerate(
                tqdm(device_batches(loader), total=len(loader))):
            images, poses, intrinsics = host_batch
            if is_training:
                state, metrics, poses_est = train_step(state, *batch)
                train_steps += 1
                timer.tick()
            else:
                metrics, poses_est = eval_step(state, *batch)

            if pending_log is not None:
                flush_logging(*pending_log)
            pending_log = (i_batch, metrics, poses_est, poses)

            if (is_training and train_steps % args.ckpt_every == 0
                    and jax.process_index() == 0):
                # async: serialization + disk write overlap the next steps
                ckpt_writer.save(checkpoint_path(args.name, train_steps),
                                 jax.device_get(state))

            if train_steps >= args.steps:
                if jax.process_index() == 0:
                    ckpt_writer.save(checkpoint_path(args.name, train_steps),
                                     jax.device_get(state))
                should_keep_training = False
                break

        if pending_log is not None:
            flush_logging(*pending_log)

        subepoch += 1
        if subepoch == 11 or (subepoch == 10 and args.dataset in
                              ("interiornet", "streetlearn")):
            # no val subepoch for interiornet/streetlearn (train.py:205-208)
            subepoch = 0
            epoch_count += 1

    ckpt_writer.close()   # drain the in-flight write (re-raises IO errors)
    print("finished training!")
    logger.close()


if __name__ == "__main__":
    main()
