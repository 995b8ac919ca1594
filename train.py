"""Distillation training driver.

The reference snapshot ships its training stack (model/ + SelfForcingTraining
Pipeline) without a train.py entry point (SURVEY §2.6 note); this driver wires
our equivalents into a runnable loop: alternating generator / critic updates
(DMD-style, dmd.py generator_loss/critic_loss) over a dp x tp mesh.

  python train.py --config realtime_video_tpu/configs/self_forcing_server.yaml \
      --prompts prompts.txt --steps 100 [--tiny] [--loss dmd|sid]
"""
from __future__ import annotations

import argparse
import logging
import time

log = logging.getLogger(__name__)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--prompts", default=None)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--loss", default="dmd", choices=["dmd", "sid"])
    ap.add_argument("--lr", type=float, default=1e-6)
    ap.add_argument("--critic-lr", type=float, default=4e-6)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--num-frames", type=int, default=6)
    ap.add_argument("--latent", type=int, nargs=2, default=[60, 104])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--log-every", type=int, default=1)
    ap.add_argument("--ckpt-dir", default=None, help="orbax checkpoint dir")
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import optax

    from realtime_video_tpu.config import WanModelConfig, load_server_config
    from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
    from realtime_video_tpu.serving.models import load_text_encoder
    from realtime_video_tpu.training.distillation import DMD, SiD
    from realtime_video_tpu.utils.dataset import TextDataset

    config = load_server_config(args.config)
    if args.tiny:
        cfg = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
        lat_h, lat_w = 8, 8
        mk = lambda s, causal: WanDiffusion(cfg=cfg, dtype=jnp.float32, seed=s, is_causal=causal)  # noqa: E731
    else:
        lat_h, lat_w = args.latent
        name = config.get("model_name", "t2v-1.3B")
        mk = lambda s, causal: WanDiffusion(  # noqa: E731
            model_name=name, checkpoint_path=config.get("checkpoint_path", ""),
            timestep_shift=config.get("timestep_shift", 5.0), is_causal=causal, seed=s,
        )
    generator, real_score, fake_score = mk(0, True), mk(1, False), mk(2, False)

    loss_cls = {"dmd": DMD, "sid": SiD}[args.loss]
    model = loss_cls(generator, real_score, fake_score, config)
    text_encoder = load_text_encoder(config)
    prompts = (
        TextDataset(args.prompts).prompt_list if args.prompts else ["a cat surfing"]
    )

    gen_tx = optax.adamw(args.lr, weight_decay=config.get("weight_decay", 0.01))
    critic_tx = optax.adamw(args.critic_lr, weight_decay=config.get("weight_decay", 0.01))
    gen_opt = gen_tx.init(generator.params)
    critic_opt = critic_tx.init(fake_score.params)

    @jax.jit
    def gen_step(gen_params, fake_params, opt_state, noise, cross, cross_u, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: model.generator_loss(p, fake_params, noise, cross, cross_u, rng),
            has_aux=True,
        )(gen_params)
        updates, opt_state = gen_tx.update(grads, opt_state, gen_params)
        return optax.apply_updates(gen_params, updates), opt_state, loss

    @jax.jit
    def critic_step(fake_params, gen_params, opt_state, noise, cross, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: model.critic_loss(p, gen_params, noise, cross, rng),
            has_aux=True,
        )(fake_params)
        updates, opt_state = critic_tx.update(grads, opt_state, fake_params)
        return optax.apply_updates(fake_params, updates), opt_state, loss

    # checkpoint/resume (replaces fsdp_state_dict/EMA_FSDP gathers,
    # utils/distributed.py:11-20,91-125 — orbax handles sharded pytrees natively)
    mngr = None
    start_step = 0
    if args.ckpt_dir:
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(
            args.ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=3)
        )
        if args.resume and mngr.latest_step() is not None:
            start_step = mngr.latest_step()
            restored = mngr.restore(start_step)
            generator.params = restored["generator"]
            fake_score.params = restored["fake_score"]
            log.info("resumed from step %d", start_step)

    rng = jax.random.PRNGKey(config.get("seed", 0))
    for step in range(start_step, args.steps):
        prompt = prompts[step % len(prompts)]
        cross_embeds = text_encoder([prompt])["prompt_embeds"].astype(jnp.bfloat16)
        cross = generator.compute_crossattn_cache(generator.params, cross_embeds)
        from realtime_video_tpu.config import SAMPLE_NEG_PROMPT

        neg = text_encoder([SAMPLE_NEG_PROMPT])["prompt_embeds"].astype(jnp.bfloat16)
        cross_u = generator.compute_crossattn_cache(generator.params, neg)
        rng, r_n, r_g, r_c = jax.random.split(rng, 4)
        noise = jax.random.normal(
            r_n, (args.batch, args.num_frames, 16, lat_h, lat_w), jnp.float32
        )
        t0 = time.time()
        generator.params, gen_opt, g_loss = gen_step(
            generator.params, fake_score.params, gen_opt, noise, cross, cross_u, r_g
        )
        fake_score.params, critic_opt, c_loss = critic_step(
            fake_score.params, generator.params, critic_opt, noise, cross, r_c
        )
        if step % args.log_every == 0:
            log.info(
                "step %d: gen %.4f critic %.4f (%.2fs)",
                step, float(g_loss), float(c_loss), time.time() - t0,
            )
        if mngr is not None and step and step % args.save_every == 0:
            import orbax.checkpoint as ocp

            mngr.save(
                step,
                args=ocp.args.StandardSave(
                    {"generator": generator.params, "fake_score": fake_score.params}
                ),
            )
    if mngr is not None:
        mngr.wait_until_finished()


if __name__ == "__main__":
    main()
