"""Host vs device hist-augmentation statistical equivalence (VERDICT r2
item 2).

The reference drops ``int(n_valid * drop_hist)`` zone indices drawn WITH
replacement (/root/reference/src/dataloader/nyu.py:155-158), giving an
effective per-zone drop probability of 1-(1-1/n)^m — ~28.8% for p=0.34 on a
full 8x8 grid, not 34%. The host path (tof_sim.augment_hist) replicates the
draw literally; the device path (tof_sim_jax.augment_hist_jax) drops i.i.d.
Bernoulli(p_eff). These tests pin:

- the analytic marginal for both paths,
- host-vs-device agreement within sampling noise,
- matching mu-noise marginals (reference nyu.py:159-163).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cfpnet_tpu.data.tof_sim import augment_hist
from cfpnet_tpu.data.tof_sim_jax import augment_hist_jax

P_DROP = 0.34
N_ZONES = 64
M = int(N_ZONES * P_DROP)  # 21 draws with replacement
P_EFF = 1.0 - (1.0 - 1.0 / N_ZONES) ** M  # ~0.2813


def _host_drop_rate(trials: int = 1500) -> float:
    rng = np.random.default_rng(0)
    fh = np.stack([np.full(N_ZONES, 2.0), np.full(N_ZONES, 0.1)], axis=1)
    dropped = 0
    for _ in range(trials):
        _, m = augment_hist(fh.astype(np.float32), np.ones(N_ZONES, bool),
                            rng, drop_hist=P_DROP)
        dropped += N_ZONES - int(m.sum())
    return dropped / (trials * N_ZONES)


def _device_drop_rate(trials: int = 1500) -> float:
    fh = jnp.stack(
        [jnp.full((trials, N_ZONES), 2.0), jnp.full((trials, N_ZONES), 0.1)],
        axis=-1,
    )
    mask = jnp.ones((trials, N_ZONES), bool)
    _, m = jax.jit(
        lambda f, mk, r: augment_hist_jax(f, mk, r, P_DROP, 0.0, 0.0, 0.0)
    )(fh, mask, jax.random.key(1))
    return float(1.0 - np.asarray(m).mean())


def test_drop_marginals_match_reference_semantics():
    host = _host_drop_rate()
    dev = _device_drop_rate()
    # the analytic with-replacement marginal — NOT the naive 0.34
    assert abs(host - P_EFF) < 0.012, (host, P_EFF)
    assert abs(dev - P_EFF) < 0.012, (dev, P_EFF)
    assert abs(host - dev) < 0.02, (host, dev)
    # regression guard: the round-2 device path dropped at the naive rate
    assert abs(dev - P_DROP) > 0.03


def test_device_drop_scales_with_valid_count():
    """p_eff depends on the per-sample valid count n — a half-empty grid
    must drop at its own 1-(1-1/n)^{floor(p n)} rate."""
    n = 16
    trials = 3000
    mask = jnp.zeros((trials, N_ZONES), bool).at[:, :n].set(True)
    fh = jnp.ones((trials, N_ZONES, 2))
    _, m = jax.jit(
        lambda f, mk, r: augment_hist_jax(f, mk, r, P_DROP, 0.0, 0.0, 0.0)
    )(fh, mask, jax.random.key(2))
    got = 1.0 - np.asarray(m)[:, :n].mean()
    expect = 1.0 - (1.0 - 1.0 / n) ** int(n * P_DROP)
    assert abs(got - expect) < 0.015, (got, expect)
    # invalid zones stay invalid
    assert not np.asarray(m)[:, n:].any()


def test_noise_marginals_match():
    """mu noise: applied w.p. noise_prob to surviving valid zones, drawn
    N(noise_mean, noise_sigma) — host and device mean shifts must agree
    (reference nyu.py:159-163)."""
    prob, mean, sigma = 0.30, 0.17, 0.20
    trials = 1200

    rng = np.random.default_rng(3)
    fh0 = np.stack([np.full(N_ZONES, 2.0), np.full(N_ZONES, 0.1)], axis=1)
    shift_h, hits_h = [], 0
    for _ in range(trials):
        fh, m = augment_hist(fh0.astype(np.float32), np.ones(N_ZONES, bool),
                             rng, noise_prob=prob, noise_mean=mean,
                             noise_sigma=sigma)
        d = fh[:, 0] - 2.0
        shift_h.append(d.sum())
        hits_h += int((d != 0).sum())
    host_shift = np.sum(shift_h) / (trials * N_ZONES)
    host_rate = hits_h / (trials * N_ZONES)

    fh = jnp.broadcast_to(jnp.asarray(fh0, jnp.float32),
                          (trials, N_ZONES, 2))
    mask = jnp.ones((trials, N_ZONES), bool)
    fh2, _ = jax.jit(
        lambda f, mk, r: augment_hist_jax(f, mk, r, 0.0, prob, mean, sigma)
    )(fh, mask, jax.random.key(4))
    d = np.asarray(fh2)[..., 0] - 2.0
    dev_shift = d.mean()
    dev_rate = (d != 0).mean()

    assert abs(host_rate - prob) < 0.02, host_rate
    assert abs(dev_rate - prob) < 0.02, dev_rate
    assert abs(host_shift - prob * mean) < 0.01, host_shift
    assert abs(dev_shift - prob * mean) < 0.01, dev_shift
    assert abs(host_shift - dev_shift) < 0.012
