"""Hamiltonian Monte Carlo + iterative NUTS, fully jittable/vmappable.

New capability over the reference (BASELINE.json config 4): fully
Bayesian hyperposteriors. Design constraints that shaped this module:

- every step is lax-traced (scan/while_loop/fori_loop) so a whole
  chain compiles into one XLA program;
- chains are a leading batch axis — `jax.vmap` over keys gives chain
  parallelism, and sharding that axis over a mesh spreads chains
  across hosts (gp_ss_ak_tpu.bayes.api);
- NUTS uses the ITERATIVE tree build (Phan & Pradhan's trick): a
  subtree of 2^d leapfrogs keeps a max_depth stack of checkpoint
  states; even leaves are stored at stack slot popcount(i), odd
  leaves U-turn-check against slots [popcount(i)-trailing_ones(i),
  popcount(i)-1]. No recursion, fixed shapes, O(depth) memory.
- warmup adapts the step size by dual averaging (target accept 0.8)
  and a diagonal mass matrix from the second half of warmup.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["hmc_sample", "nuts_sample"]


def _leapfrog(log_post_grad, z, r, eps, inv_mass):
    lp, g = log_post_grad(z)
    r = r + 0.5 * eps * g
    z = z + eps * inv_mass * r
    lp, g = log_post_grad(z)
    r = r + 0.5 * eps * g
    return z, r, lp, g


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(inv_mass * r * r)


# ---------------------------------------------------------------------------
# full-matrix mass (dense preconditioning)
# ---------------------------------------------------------------------------
#
# A diagonal mass cannot precondition a CORRELATED posterior: at large
# N the flagship hyperposterior is a tight ellipse with strong
# angle/width correlations, and diagonal-mass HMC random-walks along
# the stiff directions (measured at N=16384: accept 0.84 but
# R-hat 2.9 over 2 x 150 transitions). With M = cov(posterior) the
# transformed posterior is ~isotropic and mixes in O(1) transitions —
# the standard dense-metric recipe (Stan's dense_e). M is p x p with
# p ~ 10 hypers, so every apply is trivial next to one NLML eval.

def _leapfrog_full(log_post_grad, z, r, eps, Minv):
    lp, g = log_post_grad(z)
    r = r + 0.5 * eps * g
    z = z + eps * (Minv @ r)
    lp, g = log_post_grad(z)
    r = r + 0.5 * eps * g
    return z, r, lp, g


def _kinetic_full(r, Minv):
    return 0.5 * jnp.dot(r, Minv @ r)


def _hmc_transition_full(log_post_grad, z, key, eps, n_leapfrog,
                         mass_chol, Minv):
    """One HMC transition under a dense mass matrix M = L L^T
    (`mass_chol` = L, `Minv` = M^-1, both precomputed): momenta are
    drawn r = L xi, the kinetic energy is r^T M^-1 r / 2, and the
    position update moves along M^-1 r. Orientation is the Stan
    dense-metric convention: M^-1 approximates the POSTERIOR
    COVARIANCE (so M ~ precision); with that choice eps ~ O(1)."""
    k_mom, k_acc = jax.random.split(key)
    xi = jax.random.normal(k_mom, z.shape, z.dtype)
    r0 = mass_chol @ xi
    lp0, _ = log_post_grad(z)
    H0 = -lp0 + _kinetic_full(r0, Minv)

    def body(_, carry):
        z, r = carry
        z, r, _, _ = _leapfrog_full(log_post_grad, z, r, eps, Minv)
        return z, r

    z1, r1 = lax.fori_loop(0, n_leapfrog, body, (z, r0))
    lp1, _ = log_post_grad(z1)
    H1 = -lp1 + _kinetic_full(r1, Minv)
    dH = H0 - H1
    accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(dH, 50.0)))
    accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0, accept_prob)
    accept = jax.random.uniform(k_acc) < accept_prob
    z_new = jnp.where(accept, z1, z)
    return z_new, accept_prob


# ---------------------------------------------------------------------------
# dual averaging (Nesterov) for step size
# ---------------------------------------------------------------------------

class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    t: jnp.ndarray


def _da_init(eps0):
    return _DAState(jnp.log(eps0), jnp.log(eps0), jnp.zeros(()),
                    jnp.zeros(()))


def _da_update(s: _DAState, accept_prob, target=0.8, gamma=0.05, t0=10.0,
               kappa=0.75):
    t = s.t + 1.0
    h_bar = (1.0 - 1.0 / (t + t0)) * s.h_bar + (target - accept_prob) / (
        t + t0)
    log_eps = s.log_eps_bar - jnp.sqrt(t) / gamma * h_bar
    w = t ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * s.log_eps_bar
    return _DAState(log_eps, log_eps_bar, h_bar, t)


# ---------------------------------------------------------------------------
# plain HMC (multinomial over the trajectory is overkill here; classic
# Metropolis endpoint accept)
# ---------------------------------------------------------------------------

def _hmc_transition(log_post_grad, z, key, eps, n_leapfrog, inv_mass):
    k_mom, k_acc = jax.random.split(key)
    r0 = jax.random.normal(k_mom, z.shape, z.dtype) / jnp.sqrt(inv_mass)
    lp0, _ = log_post_grad(z)
    H0 = -lp0 + _kinetic(r0, inv_mass)

    def body(_, carry):
        z, r = carry
        z, r, _, _ = _leapfrog(log_post_grad, z, r, eps, inv_mass)
        return z, r

    z1, r1 = lax.fori_loop(0, n_leapfrog, body, (z, r0))
    lp1, _ = log_post_grad(z1)
    H1 = -lp1 + _kinetic(r1, inv_mass)
    dH = H0 - H1
    accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(dH, 50.0)))
    accept_prob = jnp.where(jnp.isnan(accept_prob), 0.0, accept_prob)
    u = jax.random.uniform(k_acc)
    accept = u < accept_prob
    z_new = jnp.where(accept, z1, z)
    return z_new, accept_prob


def hmc_sample(log_post: Callable, z0: jnp.ndarray, key,
               n_samples: int = 500, n_warmup: int = 300,
               init_step_size: float = 0.1, n_leapfrog: int = 16):
    """One chain; vmap over (z0, key) for many. Returns (samples,
    accept_probs)."""
    lp_grad = jax.value_and_grad(log_post)

    def log_post_grad(z):
        v, g = lp_grad(z)
        v = jnp.where(jnp.isnan(v), -jnp.inf, v)
        g = jnp.where(jnp.isnan(g), 0.0, g)
        return v, g

    dim = z0.shape[0]
    inv_mass0 = jnp.ones((dim,), z0.dtype)

    # -- warmup: adapt eps (all), mass (second half) --------------------
    def warm_body(carry, key):
        z, da, mean, m2, count = carry
        eps = jnp.exp(da.log_eps)
        z, ap = _hmc_transition(log_post_grad, z, key, eps, n_leapfrog,
                                inv_mass0)
        da = _da_update(da, ap)
        count1 = count + 1.0
        delta = z - mean
        mean1 = mean + delta / count1
        m2_1 = m2 + delta * (z - mean1)
        in_2nd = da.t > (n_warmup // 2)
        mean, m2, count = (jnp.where(in_2nd, mean1, mean),
                           jnp.where(in_2nd, m2_1, m2),
                           jnp.where(in_2nd, count1, count))
        return (z, da, mean, m2, count), None

    keys = jax.random.split(key, n_warmup + n_samples + 1)
    init = (z0, _da_init(jnp.asarray(init_step_size, z0.dtype)),
            jnp.zeros_like(z0), jnp.zeros_like(z0), jnp.zeros(()))
    (z, da, mean, m2, count), _ = lax.scan(warm_body, init,
                                           keys[:n_warmup])
    var = jnp.where(count > 2, m2 / jnp.maximum(count - 1.0, 1.0), 1.0)
    inv_mass = jnp.clip(var, 1e-4, 1e4)
    eps = jnp.exp(da.log_eps_bar)

    def samp_body(z, key):
        z, ap = _hmc_transition(log_post_grad, z, key, eps, n_leapfrog,
                                inv_mass)
        return z, (z, ap)

    _, (samples, aps) = lax.scan(samp_body, z, keys[n_warmup:-1])
    return samples, aps


# ---------------------------------------------------------------------------
# iterative NUTS
# ---------------------------------------------------------------------------

class _TreeState(NamedTuple):
    z_prop: jnp.ndarray        # current proposal
    log_w: jnp.ndarray         # subtree total log weight
    z_end: jnp.ndarray         # forward end position
    r_end: jnp.ndarray         # forward end momentum
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray    # sum of min(1, exp(H0 - H)) over leaves
    n_leaves: jnp.ndarray


def _popcount(x):
    return jax.lax.population_count(x)


def _trailing_ones(x):
    # number of trailing 1-bits of x
    return _popcount(x & ~(x + 1))


def _uturn(z_a, r_a, z_b, r_b, inv_mass):
    dz = z_b - z_a
    return (jnp.dot(dz, inv_mass * r_a) < 0) | (
        jnp.dot(dz, inv_mass * r_b) < 0)


def _build_subtree(log_post_grad, z0, r0, depth_max, n_leaf, eps, H0,
                   inv_mass, key):
    """Run n_leaf = 2^depth leapfrogs from (z0, r0) in direction of eps
    (sign folded into eps). Iterative u-turn checks via the checkpoint
    stack. Returns _TreeState."""
    dim = z0.shape[0]
    dtype = z0.dtype
    zc = jnp.zeros((depth_max + 1, dim), dtype)   # checkpoint positions
    rc = jnp.zeros((depth_max + 1, dim), dtype)   # checkpoint momenta

    def body(carry):
        (i, z, r, zc, rc, st, key) = carry
        z, r, lp, _ = _leapfrog(log_post_grad, z, r, eps, inv_mass)
        H = -lp + _kinetic(r, inv_mass)
        dH = H0 - H
        diverge = (dH < -1000.0) | jnp.isnan(dH)
        log_w_leaf = jnp.where(diverge, -jnp.inf, dH)
        accept = jnp.exp(jnp.minimum(dH, 0.0))
        accept = jnp.where(jnp.isnan(accept), 0.0, accept)

        # multinomial-combine proposal
        log_w_new = jnp.logaddexp(st.log_w, log_w_leaf)
        key, k1 = jax.random.split(key)
        take = jnp.log(jax.random.uniform(k1)) < (log_w_leaf - st.log_w)
        z_prop = jnp.where(take, z, st.z_prop)

        # checkpoints: even leaf -> store; odd leaf -> check ancestors
        is_even = (i % 2) == 0
        pos = _popcount(i)
        zc = jnp.where(is_even, zc.at[pos].set(z), zc)
        rc = jnp.where(is_even, rc.at[pos].set(r), rc)
        idx_max = pos - 1
        idx_min = pos - _trailing_ones(i)

        def check_turn(_):
            def chk(j, t):
                active = (j >= idx_min) & (j <= idx_max)
                t_j = _uturn(zc[j], rc[j], z, r, inv_mass)
                return t | (active & t_j)
            return lax.fori_loop(0, depth_max + 1, chk, jnp.asarray(False))

        turning = jnp.where(is_even, st.turning,
                            st.turning | check_turn(None))
        st = _TreeState(
            z_prop=z_prop,
            log_w=log_w_new,
            z_end=z, r_end=r,
            turning=turning,
            diverging=st.diverging | diverge,
            sum_accept=st.sum_accept + accept,
            n_leaves=st.n_leaves + 1,
        )
        return (i + 1, z, r, zc, rc, st, key)

    def cond(carry):
        i, _, _, _, _, st, _ = carry
        return (i < n_leaf) & (~st.turning) & (~st.diverging)

    st0 = _TreeState(z_prop=z0, log_w=-jnp.inf, z_end=z0, r_end=r0,
                     turning=jnp.asarray(False), diverging=jnp.asarray(False),
                     sum_accept=jnp.zeros(()), n_leaves=jnp.zeros(()))
    i0 = jnp.asarray(0, jnp.int32)
    out = lax.while_loop(cond, body, (i0, z0, r0, zc, rc, st0, key))
    return out[5]


def _nuts_transition(log_post_grad, z, key, eps, inv_mass,
                     max_depth: int = 8):
    dim = z.shape[0]
    k_mom, key = jax.random.split(key)
    r0 = jax.random.normal(k_mom, z.shape, z.dtype) / jnp.sqrt(inv_mass)
    lp0, _ = log_post_grad(z)
    H0 = -lp0 + _kinetic(r0, inv_mass)

    class Carry(NamedTuple):
        depth: jnp.ndarray
        z_prop: jnp.ndarray
        log_w: jnp.ndarray
        z_minus: jnp.ndarray
        r_minus: jnp.ndarray
        z_plus: jnp.ndarray
        r_plus: jnp.ndarray
        turning: jnp.ndarray
        diverging: jnp.ndarray
        sum_accept: jnp.ndarray
        n_leaves: jnp.ndarray
        key: jnp.ndarray

    def cond(c: Carry):
        return (c.depth < max_depth) & (~c.turning) & (~c.diverging)

    def body(c: Carry):
        key, k_dir, k_sub, k_acc = jax.random.split(c.key, 4)
        go_fwd = jax.random.bernoulli(k_dir)
        z_start = jnp.where(go_fwd, c.z_plus, c.z_minus)
        r_start = jnp.where(go_fwd, c.r_plus, c.r_minus)
        eps_signed = jnp.where(go_fwd, eps, -eps)
        n_leaf = jnp.asarray(1, jnp.int32) << c.depth
        st = _build_subtree(log_post_grad, z_start, r_start, max_depth,
                            n_leaf, eps_signed, H0, inv_mass, k_sub)

        # biased progressive sampling: take new subtree's proposal with
        # prob min(1, W_new / W_old)
        take = (jnp.log(jax.random.uniform(k_acc)) < (st.log_w - c.log_w)
                ) & (~st.turning) & (~st.diverging)
        z_prop = jnp.where(take, st.z_prop, c.z_prop)
        log_w = jnp.logaddexp(c.log_w, jnp.where(
            st.turning | st.diverging, -jnp.inf, st.log_w))

        z_minus = jnp.where(go_fwd, c.z_minus, st.z_end)
        r_minus = jnp.where(go_fwd, c.r_minus, st.r_end)
        z_plus = jnp.where(go_fwd, st.z_end, c.z_plus)
        r_plus = jnp.where(go_fwd, st.r_end, c.r_plus)
        turning_all = _uturn(z_minus, r_minus, z_plus, r_plus, inv_mass)

        return Carry(
            depth=c.depth + 1,
            z_prop=z_prop, log_w=log_w,
            z_minus=z_minus, r_minus=r_minus,
            z_plus=z_plus, r_plus=r_plus,
            turning=st.turning | turning_all,
            diverging=c.diverging | st.diverging,
            sum_accept=c.sum_accept + st.sum_accept,
            n_leaves=c.n_leaves + st.n_leaves,
            key=key,
        )

    init = Carry(jnp.asarray(0, jnp.int32), z, jnp.zeros(()),
                 z, r0, z, r0, jnp.asarray(False), jnp.asarray(False),
                 jnp.zeros(()), jnp.ones(()), key)
    out = lax.while_loop(cond, body, init)
    accept_stat = out.sum_accept / jnp.maximum(out.n_leaves, 1.0)
    return out.z_prop, accept_stat


def nuts_sample(log_post: Callable, z0: jnp.ndarray, key,
                n_samples: int = 500, n_warmup: int = 300,
                init_step_size: float = 0.1, max_depth: int = 8):
    """One NUTS chain (vmap over (z0, key) for many). Returns
    (samples, accept_stats)."""
    lp_grad = jax.value_and_grad(log_post)

    def log_post_grad(z):
        v, g = lp_grad(z)
        v = jnp.where(jnp.isnan(v), -jnp.inf, v)
        g = jnp.where(jnp.isnan(g), 0.0, g)
        return v, g

    dim = z0.shape[0]
    inv_mass0 = jnp.ones((dim,), z0.dtype)

    def warm_body(carry, key):
        z, da, mean, m2, count = carry
        eps = jnp.exp(da.log_eps)
        z, ap = _nuts_transition(log_post_grad, z, key, eps, inv_mass0,
                                 max_depth)
        da = _da_update(da, ap)
        count1 = count + 1.0
        delta = z - mean
        mean1 = mean + delta / count1
        m2_1 = m2 + delta * (z - mean1)
        in_2nd = da.t > (n_warmup // 2)
        mean, m2, count = (jnp.where(in_2nd, mean1, mean),
                           jnp.where(in_2nd, m2_1, m2),
                           jnp.where(in_2nd, count1, count))
        return (z, da, mean, m2, count), None

    keys = jax.random.split(key, n_warmup + n_samples + 1)
    init = (z0, _da_init(jnp.asarray(init_step_size, z0.dtype)),
            jnp.zeros_like(z0), jnp.zeros_like(z0), jnp.zeros(()))
    (z, da, mean, m2, count), _ = lax.scan(warm_body, init,
                                           keys[:n_warmup])
    var = jnp.where(count > 2, m2 / jnp.maximum(count - 1.0, 1.0), 1.0)
    inv_mass = jnp.clip(var, 1e-4, 1e4)
    eps = jnp.exp(da.log_eps_bar)

    def samp_body(z, key):
        z, ap = _nuts_transition(log_post_grad, z, key, eps, inv_mass,
                                 max_depth)
        return z, (z, ap)

    _, (samples, aps) = lax.scan(samp_body, z, keys[n_warmup:-1])
    return samples, aps
