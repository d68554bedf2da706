"""Phasic Policy Gradient in JAX — expert training for demo collection.

Re-design of the reference's torch+MPI PPG stack
(data/PPG/phasic_policy_gradient/{ppg,ppo,roller,torch_util}.py):

  * PhasicValueModel: Impala-CNN policy/value with the reference's "dual"
    architecture (separate pi and vf encoders; an auxiliary value head on the
    pi encoder, ppg.py:68-163);
  * policy phase: PPO — GAE advantages, clipped surrogate + value + entropy
    losses, minibatched epochs (ppo.py:21-116);
  * auxiliary phase: distill the value function into the aux head while
    KL-cloning the policy over the segment buffer (ppg.py:179-276);
  * the roller steps N host envs in lockstep with batched device inference;
  * scaling: one jitted update over the dp mesh instead of MPI allreduce
    (torch_util.py:440+) — gradients sync over ICI via GSPMD.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from ..models.impala import ImpalaCNN
from .reward_normalizer import RewardNormalizer


class PhasicValueModel(nn.Module):
    num_actions: int = 15
    arch: str = "dual"  # dual | shared | detach
    pool_padding: str = "same"  # "torch" for converted reference experts

    def setup(self):
        self.pi_enc = ImpalaCNN(name="pi_enc", pool_padding=self.pool_padding)
        if self.arch == "dual":
            self.vf_enc = ImpalaCNN(name="vf_enc", pool_padding=self.pool_padding)
        self.pi_head = nn.Dense(self.num_actions, kernel_init=nn.initializers.orthogonal(0.1))
        self.vf_head = nn.Dense(1, kernel_init=nn.initializers.orthogonal(0.1))
        self.aux_vf_head = nn.Dense(1, kernel_init=nn.initializers.orthogonal(0.1))

    def __call__(self, obs):
        """obs: (B, H, W, C) float in [0,1] -> (logits, value, aux_value)."""
        pi_x = self.pi_enc(obs)
        logits = self.pi_head(pi_x)
        aux_value = self.aux_vf_head(pi_x)[..., 0]
        if self.arch == "dual":
            vf_x = self.vf_enc(obs)
        elif self.arch == "detach":
            vf_x = jax.lax.stop_gradient(pi_x)
        else:
            vf_x = pi_x
        value = self.vf_head(vf_x)[..., 0]
        return logits, value, aux_value

    def act(self, obs):
        logits, value, _ = self(obs)
        return logits, value


def compute_gae(rewards, values, dones, last_value, gamma=0.999, lam=0.95):
    """Generalized advantage estimation over a (T, N) segment (ppo.py:21-46)."""
    T = rewards.shape[0]
    values_ext = np.concatenate([values, last_value[None]], axis=0)
    adv = np.zeros_like(rewards)
    lastgaelam = 0.0
    for t in reversed(range(T)):
        nonterminal = 1.0 - dones[t]
        delta = rewards[t] + gamma * values_ext[t + 1] * nonterminal - values_ext[t]
        lastgaelam = delta + gamma * lam * nonterminal * lastgaelam
        adv[t] = lastgaelam
    return adv, adv + values


@dataclasses.dataclass
class PPGConfig:
    num_envs: int = 8
    segment_length: int = 64
    gamma: float = 0.999
    lam: float = 0.95
    clip_eps: float = 0.2
    entropy_coef: float = 0.01
    vf_coef: float = 0.5
    lr: float = 5e-4
    ppo_epochs: int = 1        # reference e_pi
    vf_epochs: int = 1         # reference e_vf
    minibatches: int = 4
    n_pi: int = 8              # policy-phase iterations per aux phase
    aux_epochs: int = 6        # reference e_aux
    aux_minibatches: int = 4
    beta_clone: float = 1.0
    arch: str = "dual"
    # backward-discounted running reward normalization (reference ppo.py:158,
    # rnorm=True by default — sparse Procgen rewards hit PPO scaled)
    reward_norm: bool = True


class Roller:
    """Vectorized segment collector over host envs (roller.py:11-168)."""

    def __init__(self, envs, act_fn: Callable, seed: int = 0):
        self.envs = envs
        self.act_fn = act_fn
        self.obs = [e.reset(seed + i) for i, e in enumerate(envs)]
        self.ep_returns: list = []
        self._running = np.zeros(len(envs))
        self._seed = seed + len(envs)

    def _frames(self):
        key = self.envs[0].config.image_key.split(", ")[0]
        return np.stack([np.asarray(o["image"][key], np.float32) / 255.0 for o in self.obs])

    def collect(self, rng, T: int):
        n = len(self.envs)
        key0 = self._frames()
        obs_buf = np.zeros((T,) + key0.shape, np.float32)
        act_buf = np.zeros((T, n), np.int32)
        rew_buf = np.zeros((T, n), np.float32)
        done_buf = np.zeros((T, n), np.float32)
        logp_buf = np.zeros((T, n), np.float32)
        val_buf = np.zeros((T, n), np.float32)

        for t in range(T):
            frames = self._frames()
            rng, akey = jax.random.split(rng)
            actions, logps, values = self.act_fn(frames, akey)
            actions = np.asarray(actions)
            obs_buf[t] = frames
            act_buf[t] = actions
            logp_buf[t] = np.asarray(logps)
            val_buf[t] = np.asarray(values)
            for i, env in enumerate(self.envs):
                o, r, d, info = env.step(int(actions[i]))
                rew_buf[t, i] = r
                done_buf[t, i] = float(d)
                self._running[i] += r
                if d:
                    self.ep_returns.append(self._running[i])
                    self._running[i] = 0.0
                    o = env.reset(self._seed)
                    self._seed += 1
                self.obs[i] = o

        # consume a fresh key for the bootstrap call; returning the key we
        # just sampled with would correlate next segment's action draws
        rng, boot_rng = jax.random.split(rng)
        _, _, last_values = self.act_fn(self._frames(), boot_rng)
        return dict(
            obs=obs_buf, act=act_buf, reward=rew_buf, done=done_buf,
            logp=logp_buf, value=val_buf, last_value=np.asarray(last_values),
        ), rng


class Gym3Roller:
    """Segment collector over ONE vectorized gym3 venv (batch act/observe).

    The reference's roller drives a gym3 venv whose act/observe hot loop runs
    in native code (phasic_policy_gradient/roller.py over the C++ Procgen
    engine); this is that design for arp_tpu's venvs —
    :class:`arp_tpu.envs.gym3_stub.FakeProcgenGym3` or the C++
    :class:`arp_tpu.envs.native_engine.NativeProcgenGym3` — eliminating the
    per-env Python ``env.step`` loop of :class:`Roller`.  Same segment
    contract: ``done[t]`` marks the step that ended an episode (gym3:
    ``first`` from the observe AFTER the act), auto-reset is the venv's.
    """

    def __init__(self, venv, act_fn: Callable):
        self.venv = venv
        self.act_fn = act_fn
        self.ep_returns: list = []
        self._running = np.zeros(venv.num)
        _, obs, _ = venv.observe()  # initial first=True: fresh episodes, no return to record
        self._rgb = obs["rgb"]

    def _frames(self):
        return np.asarray(self._rgb, np.float32) / 255.0

    def collect(self, rng, T: int):
        n = self.venv.num
        frames0 = self._frames()
        obs_buf = np.zeros((T,) + frames0.shape, np.float32)
        act_buf = np.zeros((T, n), np.int32)
        rew_buf = np.zeros((T, n), np.float32)
        done_buf = np.zeros((T, n), np.float32)
        logp_buf = np.zeros((T, n), np.float32)
        val_buf = np.zeros((T, n), np.float32)

        for t in range(T):
            frames = self._frames()
            rng, akey = jax.random.split(rng)
            actions, logps, values = self.act_fn(frames, akey)
            obs_buf[t] = frames
            act_buf[t] = np.asarray(actions)
            logp_buf[t] = np.asarray(logps)
            val_buf[t] = np.asarray(values)
            self.venv.act(np.asarray(actions))
            # ONE observe per act (gym3 semantics): rew is this act's reward,
            # first=True means the episode ended and the venv auto-reset
            rew, obs, first = self.venv.observe()
            rew_buf[t] = rew
            done_buf[t] = first.astype(np.float32)
            self._running += rew
            for i in np.nonzero(first)[0]:
                self.ep_returns.append(self._running[i])
                self._running[i] = 0.0
            self._rgb = obs["rgb"]

        rng, boot_rng = jax.random.split(rng)
        _, _, last_values = self.act_fn(self._frames(), boot_rng)
        return dict(
            obs=obs_buf, act=act_buf, reward=rew_buf, done=done_buf,
            logp=logp_buf, value=val_buf, last_value=np.asarray(last_values),
        ), rng


def make_ppg_steps(model: PhasicValueModel, config: PPGConfig):
    """Jitted PPO update + aux update."""

    def ppo_loss(params, batch):
        logits, value, _ = model.apply({"params": params}, batch["obs"])
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(logp_all, batch["act"][:, None], axis=-1)[:, 0]
        ratio = jnp.exp(logp - batch["logp_old"])
        adv = batch["adv"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1 - config.clip_eps, 1 + config.clip_eps) * adv
        pg_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        vf_loss = 0.5 * jnp.mean((value - batch["vtarg"]) ** 2)
        entropy = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
        loss = pg_loss + config.vf_coef * vf_loss - config.entropy_coef * entropy
        return loss, {"pg_loss": pg_loss, "vf_loss": vf_loss, "entropy": entropy}

    @jax.jit
    def ppo_step(state, batch):
        (loss, aux), grads = jax.value_and_grad(ppo_loss, has_aux=True)(state.params, batch)
        return state.apply_gradients(grads=grads), dict(aux, loss=loss)

    # Separate pi/vf phases (reference ppo.py:151-152, 221-228): each phase
    # keeps its OWN persistent optimizer state, so adam moments never mix —
    # a vf leaf whose grads are structurally zero under the pi loss stays
    # exactly still during pi epochs (mu = nu = 0), matching torch's
    # skip-None-grad behavior with separate optimizers. The reference keeps
    # vfcoef on the vf loss even in separate mode (losses["vf"], ppo.py:109).
    def pi_only_loss(params, batch):
        loss, aux = ppo_loss(params, batch)
        return aux["pg_loss"] - config.entropy_coef * aux["entropy"], aux

    def vf_only_loss(params, batch):
        loss, aux = ppo_loss(params, batch)
        return config.vf_coef * aux["vf_loss"], aux

    pi_tx = optax.adam(config.lr)
    vf_tx = optax.adam(config.lr)

    @jax.jit
    def pi_step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(pi_only_loss, has_aux=True)(params, batch)
        updates, opt_state = pi_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, dict(aux, loss=loss)

    @jax.jit
    def vf_step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(vf_only_loss, has_aux=True)(params, batch)
        updates, opt_state = vf_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, dict(aux, loss=loss)

    def init_phase_opts(params):
        return pi_tx.init(params), vf_tx.init(params)

    def aux_loss(params, batch):
        logits, value, aux_value = model.apply({"params": params}, batch["obs"])
        logp_all = jax.nn.log_softmax(logits)
        old_logp_all = jax.nn.log_softmax(batch["old_logits"])
        kl = jnp.mean(jnp.sum(jnp.exp(old_logp_all) * (old_logp_all - logp_all), axis=-1))
        aux_vf = 0.5 * jnp.mean((aux_value - batch["vtarg"]) ** 2)
        true_vf = 0.5 * jnp.mean((value - batch["vtarg"]) ** 2)
        loss = aux_vf + true_vf + config.beta_clone * kl
        return loss, {"aux_vf": aux_vf, "true_vf": true_vf, "kl": kl}

    @jax.jit
    def aux_step(state, batch):
        (loss, aux), grads = jax.value_and_grad(aux_loss, has_aux=True)(state.params, batch)
        return state.apply_gradients(grads=grads), dict(aux, loss=loss)

    @jax.jit
    def act(params, frames, rng):
        logits, value, _ = model.apply({"params": params}, frames)
        action = jax.random.categorical(rng, logits)
        logp = jnp.take_along_axis(jax.nn.log_softmax(logits), action[:, None], axis=-1)[:, 0]
        return action, logp, value

    @jax.jit
    def logits_of(params, frames):
        logits, _, _ = model.apply({"params": params}, frames)
        return logits

    return ppo_step, aux_step, act, logits_of, pi_step, vf_step, init_phase_opts


def learn(
    env_fn: Callable,
    config: PPGConfig = PPGConfig(),
    total_iterations: int = 8,
    seed: int = 0,
    logger=None,
    mesh=None,
    checkpoint_dir: str | None = None,
    save_every: int = 0,
    venv_fn: Callable | None = None,
):
    """Run PPG; returns (train_state, metrics_history).

    ``venv_fn(seed) -> gym3 venv`` (num == config.num_envs): collect segments
    with :class:`Gym3Roller` over one vectorized venv (batch act / batch
    render — the reference's roller-over-gym3 design) instead of the per-env
    Python ``env.step`` loop; ``env_fn`` is ignored then.

    ``mesh``: optional `jax.sharding.Mesh` — minibatches shard over the data
    axes and GSPMD inserts the gradient reductions over ICI, replacing the
    reference's MPI flat-buffer allreduce (torch_util.py:440-470).  Params
    stay replicated (pure dp).

    Multi-process (a global mesh under ``jax.distributed``): each process
    rolls its OWN ``num_envs`` envs with process-offset seeds — the
    reference's per-MPI-rank collection (train.py + roller) — acts on its
    local devices with a per-iteration snapshot of the replicated params,
    and the updates assemble the global batch from every rank's local
    segments (``make_array_from_process_local_data``), so gradients see all
    ranks' data exactly like the MPI allreduce.  Reward normalization and
    advantage whitening stay per-rank (as in the reference).  Checkpointing
    under multi-process is not supported yet (asserted loudly).

    ``checkpoint_dir`` + ``save_every``: periodic orbax saves of
    {train state, phase optimizers, reward-normalizer stats, iteration,
    history} with automatic resume from the latest step — the reference's
    periodic model save (log_save_helper.py:117-139) plus exact
    optimizer-state resume, which the reference does not have.
    Deliberately NOT saved: rollout/env state (matching the reference — a
    resumed run re-warms its envs) and the aux-phase ``seg_buffer`` (up to
    n_pi full segments of frames; the first aux phase after a resume
    distills from however many segments accumulated since — the reference
    restarts with an empty buffer too, since it cannot resume at all).
    """
    multiproc = mesh is not None and jax.process_count() > 1
    # per-rank env exploration: offset the ENV seeds by process (params init
    # below keeps the shared `seed` so all ranks start identical)
    env_seed = seed + (jax.process_index() * 100003 if multiproc else 0)
    assert not (multiproc and checkpoint_dir), (
        "multi-process PPG checkpointing is not coordinated yet — run saves "
        "from a single-process job"
    )
    venv = None
    if venv_fn is not None:
        venv = venv_fn(env_seed)
        assert venv.num == config.num_envs, (venv.num, config.num_envs)
        frame_shape = venv.observe()[1]["rgb"].shape[1:]
    else:
        envs = [env_fn() for _ in range(config.num_envs)]
        key = envs[0].config.image_key.split(", ")[0]
        probe = envs[0].reset(env_seed)
        frame_shape = np.asarray(probe["image"][key]).shape
    model = PhasicValueModel(num_actions=15, arch=config.arch)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1,) + frame_shape, jnp.float32))["params"]
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.adam(config.lr))

    ppo_step, aux_step, act_jit, logits_of, pi_step, vf_step, init_phase_opts = make_ppg_steps(model, config)

    separate_phases = config.ppo_epochs != config.vf_epochs
    phase_opts = init_phase_opts(state.params) if separate_phases else None

    start_it = 0
    history = []
    restored_normalizer = None
    mngr = None
    if checkpoint_dir:
        from ..checkpoint import CheckpointManager

        mngr = CheckpointManager(checkpoint_dir)
        if mngr.latest_step() is not None:
            template = {"state": state}
            if separate_phases:
                template["phase_opts"] = phase_opts
            if config.reward_norm:
                template["normalizer"] = RewardNormalizer(
                    config.num_envs, gamma=config.gamma
                ).state_dict()
            restored, meta = mngr.restore(template)
            state = restored["state"]
            if separate_phases:
                phase_opts = tuple(restored["phase_opts"])
            restored_normalizer = restored.get("normalizer")
            start_it = int(meta.get("iteration", -1)) + 1
            history = list(meta.get("history", []))

    if mesh is not None:
        from ..parallel.mesh import replicated

        state = jax.device_put(state, replicated(mesh))
        if phase_opts is not None:
            phase_opts = jax.device_put(phase_opts, replicated(mesh))

    def _save(it):
        payload = {"state": jax.device_get(state)}
        if separate_phases:
            payload["phase_opts"] = jax.device_get(phase_opts)
        if normalizer is not None:
            payload["normalizer"] = normalizer.state_dict()
        mngr.save(it, payload, metadata={"iteration": it, "history": history}, wait=True)

    put_batch, put_array = _make_put_fns(mesh)

    act_params = {"v": None}  # multiproc: local-device snapshot of the params

    def _refresh_act_params():
        if multiproc:
            act_params["v"] = jax.device_put(jax.device_get(state.params))

    def act_fn(frames, rng):
        if multiproc:
            # acting is per-rank on LOCAL devices: global arrays cannot be
            # fetched per-step, and each rank's frames differ (no replication)
            return act_jit(act_params["v"], jnp.asarray(np.asarray(frames, np.float32)), rng)
        return act_jit(state.params, put_array(np.asarray(frames, np.float32)), rng)

    _refresh_act_params()
    roller = Gym3Roller(venv, act_fn) if venv is not None else Roller(envs, act_fn, seed=env_seed)
    rng = jax.random.PRNGKey(env_seed + 1)
    seg_buffer = []
    normalizer = (
        RewardNormalizer(config.num_envs, gamma=config.gamma) if config.reward_norm else None
    )
    if normalizer is not None and restored_normalizer is not None:
        normalizer.load_state_dict(restored_normalizer)

    for it in range(start_it, total_iterations):
        _refresh_act_params()
        seg, rng = roller.collect(rng, config.segment_length)
        if normalizer is not None:
            seg["reward"] = normalizer.normalize_segment(seg["reward"], seg["done"])
        adv, vtarg = compute_gae(
            seg["reward"], seg["value"], seg["done"], seg["last_value"],
            gamma=config.gamma, lam=config.lam,
        )
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        flat = {
            "obs": seg["obs"].reshape((-1,) + seg["obs"].shape[2:]),
            "act": seg["act"].reshape(-1),
            "logp_old": seg["logp"].reshape(-1),
            "adv": adv.reshape(-1).astype(np.float32),
            "vtarg": vtarg.reshape(-1).astype(np.float32),
        }
        n = flat["act"].shape[0]
        # per-phase metric accumulation: reported values are means over every
        # minibatch of the iteration, not last-minibatch snapshots
        acc: dict = {}

        def _acc(m, prefix=""):
            for k, v in m.items():
                acc.setdefault(prefix + k, []).append(v)

        perm_rng = np.random.default_rng(seed + it)
        if not separate_phases:
            # e_pi == e_vf: one combined objective per epoch (reference
            # ppo.py:151-152 uses a single optimizer in this case)
            for _ in range(config.ppo_epochs):
                order = perm_rng.permutation(n)
                for mb in np.array_split(order, config.minibatches):
                    state, m = ppo_step(state, put_batch({k: v[mb] for k, v in flat.items()}))
                    _acc(m)
        else:
            # e_pi != e_vf: separate epochs with separate persistent
            # optimizers, vf FIRST then pi (reference ppo.py:221-234)
            pi_opt, vf_opt = phase_opts
            params = state.params
            for _ in range(config.vf_epochs):
                order = perm_rng.permutation(n)
                for mb in np.array_split(order, config.minibatches):
                    batch = put_batch({k: v[mb] for k, v in flat.items()})
                    params, vf_opt, vmetrics = vf_step(params, vf_opt, batch)
                    _acc(vmetrics, "vf_")
            for _ in range(config.ppo_epochs):
                order = perm_rng.permutation(n)
                for mb in np.array_split(order, config.minibatches):
                    batch = put_batch({k: v[mb] for k, v in flat.items()})
                    params, pi_opt, pmetrics = pi_step(params, pi_opt, batch)
                    _acc(pmetrics)
            phase_opts = (pi_opt, vf_opt)
            state = state.replace(params=params)

        seg_buffer.append({"obs": flat["obs"], "vtarg": flat["vtarg"]})

        # aux phase every n_pi iterations
        if (it + 1) % config.n_pi == 0 and config.aux_epochs > 0:
            all_obs = np.concatenate([s["obs"] for s in seg_buffer], axis=0)
            all_vtarg = np.concatenate([s["vtarg"] for s in seg_buffer], axis=0)
            if multiproc:
                _refresh_act_params()  # post-update params for the KL anchor
                old_logits = np.asarray(logits_of(act_params["v"], jnp.asarray(all_obs)))
            else:
                old_logits = np.asarray(logits_of(state.params, put_array(all_obs)))
            m = all_obs.shape[0]
            for _ in range(config.aux_epochs):
                order = perm_rng.permutation(m)
                for mb in np.array_split(order, config.aux_minibatches):
                    batch = put_batch({
                        "obs": all_obs[mb],
                        "vtarg": all_vtarg[mb],
                        "old_logits": old_logits[mb],
                    })
                    state, aux_metrics = aux_step(state, batch)
                    # "loss" would collide with the ppo/pi-phase loss key
                    _acc({("aux_loss" if k == "loss" else k): v for k, v in aux_metrics.items()})
            seg_buffer = []

        ep_ret = float(np.mean(roller.ep_returns[-20:])) if roller.ep_returns else 0.0
        record = {k: float(np.mean([np.asarray(x) for x in v])) for k, v in acc.items()}
        record.update(iteration=it, mean_episode_return=ep_ret)
        history.append(record)
        if logger is not None:
            logger.log(record)
        if mngr is not None and (
            (save_every and (it + 1) % save_every == 0) or it + 1 == total_iterations
        ):
            _save(it)
    if mngr is not None:
        mngr.close()
    return state, history


def _make_put_fns(mesh):
    """(put_batch, put_array) — host numpy onto the device(s).

    Without a mesh: plain jnp.asarray.  With a mesh: shard the leading
    (batch) dim over the data axes when divisible, else replicate — uneven
    trailing ``np.array_split`` minibatches still work, they just run
    replicated for that minibatch.
    """
    if mesh is None:
        put_array = jnp.asarray
    else:
        from ..parallel.mesh import replicated, shard_array

        n_data = int(np.prod([mesh.shape[a] for a in ("dp", "fsdp")]))

        def put_array(x):
            x = np.asarray(x)
            if x.ndim >= 1 and x.shape[0] % n_data == 0:
                return shard_array(x, mesh)
            return jax.device_put(x, replicated(mesh))

    def put_batch(batch):
        return {k: put_array(v) for k, v in batch.items()}

    return put_batch, put_array
