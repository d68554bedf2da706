"""PPG expert training CLI — ``python -m arp_tpu.collect.train_ppg``.

Equivalent of the reference's ``python -m phasic_policy_gradient.train``
(data/PPG/phasic_policy_gradient/train.py), on JAX instead of torch+MPI.
"""

from __future__ import annotations

from absl import app, flags

from ..config import define_flags_with_default, get_user_flags
from ..logging_utils import MetricsLogger
from .ppg import PPGConfig, learn

FLAGS_DEF = define_flags_with_default(
    seed=42,
    game_name="coinrun",
    num_envs=8,
    segment_length=256,
    total_iterations=1000,
    n_epoch_pi=1,
    n_epoch_vf=1,
    reward_norm=True,
    n_aux_epochs=6,
    n_pi=32,
    lr=5e-4,
    clip_eps=0.2,
    entropy_coef=0.01,
    gamma=0.999,
    lam=0.95,
    beta_clone=1.0,
    arch="dual",
    fake_env=False,
    # "" = per-env Python wrappers; "python"/"native" = ONE vectorized gym3
    # venv (Gym3Roller; "native" is the C++ engine — the reference's
    # roller-over-gym3 design with the hot loop in native code)
    vec_env="",
    episode_length=1000,
    checkpoint_path="",
    # data-parallel mesh size for the jitted updates (0/1 = single device);
    # replaces the reference's MPI rank allreduce (torch_util.py:440-470)
    mesh_dp=0,
    # periodic orbax checkpointing + auto-resume (reference
    # log_save_helper.py:117-139 saves periodically; resume is new here)
    checkpoint_dir="",
    save_every=0,
    logging=MetricsLogger.get_default_config(),
)

FLAGS = flags.FLAGS


def main(argv):
    del argv
    logger = MetricsLogger(config=FLAGS.logging, variant=get_user_flags(FLAGS, FLAGS_DEF))

    venv_fn = None
    if FLAGS.vec_env:
        def venv_fn(seed):
            from ..envs.gym3_stub import FakeProcgenGym3

            if FLAGS.vec_env == "native":
                from ..envs.native_engine import NativeProcgenGym3 as cls
            elif FLAGS.vec_env == "python":
                cls = FakeProcgenGym3
            else:
                raise ValueError(f"--vec_env must be python|native, got {FLAGS.vec_env!r}")
            return cls(
                game_name=FLAGS.game_name, num=FLAGS.num_envs, resolution=64,
                episode_length=FLAGS.episode_length, rand_seed=seed,
            )

        def env_fn():
            raise AssertionError("unused with --vec_env")
    elif FLAGS.fake_env:
        from ..envs.fake import FakeProcgen

        def env_fn():
            return FakeProcgen(FLAGS.game_name, {"episode_length": FLAGS.episode_length})
    else:
        from ..envs.procgen import Procgen

        def env_fn():
            return Procgen(
                FLAGS.game_name,
                {"episode_length": FLAGS.episode_length, "use_train_levels": True},
                image_resolution="low",
            )

    config = PPGConfig(
        num_envs=FLAGS.num_envs,
        segment_length=FLAGS.segment_length,
        gamma=FLAGS.gamma,
        lam=FLAGS.lam,
        clip_eps=FLAGS.clip_eps,
        entropy_coef=FLAGS.entropy_coef,
        lr=FLAGS.lr,
        ppo_epochs=FLAGS.n_epoch_pi,
        vf_epochs=FLAGS.n_epoch_vf,
        reward_norm=FLAGS.reward_norm,
        n_pi=FLAGS.n_pi,
        aux_epochs=FLAGS.n_aux_epochs,
        beta_clone=FLAGS.beta_clone,
        arch=FLAGS.arch,
    )
    mesh = None
    if FLAGS.mesh_dp > 1:
        import jax

        from ..parallel.mesh import MeshConfig, create_mesh

        mesh = create_mesh(MeshConfig(dp=FLAGS.mesh_dp), devices=jax.devices()[: FLAGS.mesh_dp])
    state, history = learn(
        env_fn, config, total_iterations=FLAGS.total_iterations, seed=FLAGS.seed, logger=logger,
        mesh=mesh, checkpoint_dir=FLAGS.checkpoint_dir or None, save_every=FLAGS.save_every,
        venv_fn=venv_fn,
    )
    if FLAGS.checkpoint_path:
        import jax

        from ..checkpoint import save_pickle

        save_pickle({"params": jax.device_get(state.params), "history": history}, FLAGS.checkpoint_path)
    logger.close()


if __name__ == "__main__":
    app.run(main)
