"""Comparison baselines from Magron & Fevotte (2022): NBMF-EM and logPCA.

The reference library ships only NBMF-MM and compares against *stored
artifacts* of these two methods (``outputs/magron2022/<ds>/{NBMF-EM,logPCA}_
test_init.npz`` there).  Both baselines here were reverse-engineered from
those artifacts (factor shapes/ranges, orthonormality, loss traces, and
iteration counts) until the reproduction matches them, and both map onto the
same TPU machinery (compiled ``lax.while_loop``, batched matmuls):

- :class:`NBMFEM` — expectation-maximization for the mean-parameterized
  model ``V ~ Bernoulli(W @ H^T)`` in the artifact's parameterization:
  ``W (m, k)`` nonnegative (multiplicative ``/n`` update, no simplex
  renormalization — the stored EM/MM factors are *not* simplex-normalized),
  ``H (n, k)`` in ``[0, 1]`` via an EM responsibility-ratio update.  Under
  masking the monitored observed-only NLL is **not** guaranteed monotone:
  the paper's own stored animals trace *rises* from 0.6119 to 0.6319 and
  stops after 2 iterations (``NBMF-EM_model.npz`` ``loss``), which the
  artifact-default signed stopping rule reproduces.
- :class:`LogisticPCA` — the paper's "logPCA" is **logistic SVD**
  (Landgraf & Lee 2020): ``V ~ Bernoulli(sigmoid(1 mu^T + A B^T))`` with
  free scores ``A`` and orthonormal loadings ``B``, fit by the MM
  working-variable algorithm (one rank-k SVD per iteration).  Identified
  from the artifacts: stored ``H^T H = I``, ``W^T W`` diagonal, and
  ``logit(Y_hat) - W H^T`` exactly rank-one; our reproduction matches the
  stored animals run to 557-vs-556 iterations and 2e-4 in test NLL.

Both stop at the first iteration where ``loss[t-1] - loss[t] < tol``
(*signed absolute* difference — the rule all three method traces in the
stored artifacts obey, including stopping immediately on a loss increase),
and both expose a compact sklearn-ish surface (``fit``, ``inverse_transform``,
``reconstruction()``, ``loss_curve_``, ``n_iter_``) sufficient for the
benchmark pipeline; they are deliberately not drop-ins for ``NBMF``'s full
reference contract.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..solver.driver import _resolve_dtype, _resolve_precision
from ..utils.validation import check_array, check_is_fitted, densify

__all__ = ["NBMFEM", "LogisticPCA"]


def _signed_stop_loop(step, loss_fn, carry0, tol, max_iter: int):
    """Run ``carry -> step(carry)`` recording ``loss_fn(carry)`` each
    iteration, stopping at the first ``loss[t-1] - loss[t] < tol`` (signed
    absolute difference — the stored-artifact protocol, which also stops on
    any loss increase).  Returns ``(carry, losses, n_iter, converged)``."""

    losses0 = jnp.zeros((max_iter,), dtype=jnp.result_type(tol, jnp.float32))

    def cond(state):
        _, _, _, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        carry, losses, prev, it, done = state
        carry_new = step(carry)
        loss_t = loss_fn(carry_new)
        newly_done = jnp.logical_and(it > 0, (prev - loss_t) < tol)
        return (
            carry_new,
            losses.at[it].set(loss_t),
            loss_t,
            it + 1,
            jnp.logical_or(done, newly_done),
        )

    init = (carry0, losses0, jnp.array(jnp.inf, losses0.dtype),
            jnp.array(0, jnp.int32), jnp.array(False))
    carry, losses, _, n_iter, done = jax.lax.while_loop(cond, body, init)
    return carry, losses, n_iter, done


# ------------------------------------------------------------------ NBMF-EM
@partial(jax.jit, static_argnames=("max_iter", "precision"))
def _em_core(Ym, Cm, W0, H0, tol, eps, n_obs, *, max_iter: int, precision):
    """EM loop in the artifact parameterization: ``W (m, k)`` free
    nonnegative, ``H (n, k)`` in ``[0, 1]``; ``P = W @ H.T``.

    One iteration, in the loop structure the artifact traces pin down
    (W update, then the loss record + stopping check, then the H update —
    so a converged run returns the freshly updated W with the *previous*
    H, and ``loss[-1]`` is exactly the NLL of the returned pair):

      A = Ym / (P + eps),  B = Cm / (1 - P + eps)          # masked ratios
      W <- W (*) (A @ H + B @ (1 - H)) / n                 # multiplicative
      record loss; stop if loss[t-1] - loss[t] < tol       # signed, abs
      H <- (A'.T @ W) / (A'.T @ W + B'.T @ W + eps)        # responsibility

    Monitored loss: observed-only mean Bernoulli NLL (no prior terms; the
    artifacts were run at alpha = beta = 1).  Reproduces the stored test
    protocol to 0.4% / 0.9% (animals / paleo, 10 inits) including the
    2-3-iteration early stops.
    """
    dot = partial(jnp.matmul, precision=precision)
    n = Ym.shape[1]
    dtype = W0.dtype
    losses0 = jnp.zeros((max_iter,), dtype=dtype)

    def ratios(W, H):
        P = dot(W, H.T)
        return Ym / (P + eps), Cm / (1.0 - P + eps)

    def loss_of(W, H):
        P = dot(W, H.T)
        ll = Ym * jnp.log(P + eps) + Cm * jnp.log(1.0 - P + eps)
        return -jnp.sum(ll) / n_obs

    def cond(state):
        _, _, _, _, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        W, H, losses, prev, it, done = state
        A, B = ratios(W, H)
        W_new = W * (dot(A, H) + dot(B, 1.0 - H)) / n
        loss_t = loss_of(W_new, H)
        newly_done = jnp.logical_and(it > 0, (prev - loss_t) < tol)
        # H updates only when the loop continues: a converged iteration
        # returns (W_new, H) — the pair the recorded loss was computed on.
        A2, B2 = ratios(W_new, H)
        num = dot(A2.T, W_new)
        H_upd = num / (num + dot(B2.T, W_new) + eps)
        H_out = jnp.where(newly_done, H, H_upd)
        return (
            W_new,
            H_out,
            losses.at[it].set(loss_t),
            loss_t,
            it + 1,
            jnp.logical_or(done, newly_done),
        )

    init = (W0, H0, losses0, jnp.array(jnp.inf, dtype),
            jnp.array(0, jnp.int32), jnp.array(False))
    W, H, losses, _, n_iter, done = jax.lax.while_loop(cond, body, init)
    return W, H, losses, n_iter, done


class NBMFEM:
    """Mean-parameterized Bernoulli factorization by EM (paper baseline).

    Same model as ``NBMF`` (``V ~ Bernoulli(W @ H^T)``) without the Beta/
    Dirichlet priors, solved by EM-style multiplicative updates in the
    parameterization of the paper's stored artifacts (see module docstring).
    Matches the stored test protocol (10 random inits, train-mask fit,
    observed-only test NLL) to 0.4% on animals and 0.9% on paleo,
    including the characteristic 2-3-iteration early stops.

    Note: under masking the monitored observed-only NLL may *increase*
    (the paper's own trace does); the signed stopping rule then halts the
    fit, exactly as the artifacts show.  ``converged_`` reports whether the
    stop came from the tolerance rule rather than ``max_iter``.
    """

    def __init__(self, n_components=10, max_iter=500, tol=1e-5,
                 random_state=None, dtype=None, precision=None, eps=1e-8):
        self.n_components = n_components
        self.max_iter = max_iter
        self.tol = tol
        self.random_state = random_state
        self.dtype = dtype
        self.precision = precision
        self.eps = eps

    def fit(self, X, y=None, mask=None):
        X = densify(check_array(X, dtype=np.float64))
        if not np.all((X >= 0) & (X <= 1)):
            raise ValueError("X must be binary")
        dtype = _resolve_dtype(self.dtype)
        precision = _resolve_precision(self.precision)
        m, n = X.shape
        k = self.n_components

        # Artifact-matched init: W ~ U(0, 1/k) keeps P = W @ H.T inside
        # (0, 1) at start (stored W entries are O(1/k)); H ~ U(0, 1).
        key = jax.random.PRNGKey(0 if self.random_state is None else int(self.random_state))
        kw_, kh_ = jax.random.split(key)
        W0 = jax.random.uniform(kw_, (m, k), dtype=dtype) / k
        H0 = jax.random.uniform(kh_, (n, k), dtype=dtype)

        Xd = jnp.asarray(X, dtype=dtype)
        if mask is None:
            Ym, Cm = Xd, 1.0 - Xd
            n_obs = jnp.array(X.size, dtype=dtype)
        else:
            md = jnp.asarray(densify(mask), dtype=dtype)
            Ym, Cm = Xd * md, (1.0 - Xd) * md
            n_obs = jnp.count_nonzero(md).astype(dtype)

        W, H, losses, n_iter, done = _em_core(
            Ym, Cm, W0, H0,
            jnp.array(self.tol, dtype=dtype), jnp.array(self.eps, dtype=dtype),
            n_obs, max_iter=self.max_iter, precision=precision,
        )
        self.W_ = np.asarray(W)
        self.components_ = np.asarray(H).T  # (k, n) like NBMF
        self.n_iter_ = int(n_iter)
        self.loss_curve_ = [float(x) for x in np.asarray(losses)[: self.n_iter_]]
        self.loss_ = self.loss_curve_[-1] if self.loss_curve_ else np.inf
        self.converged_ = bool(done)
        return self

    def reconstruction(self):
        check_is_fitted(self, ["components_"])
        return np.clip(self.W_ @ self.components_, 0.0, 1.0)

    def inverse_transform(self, W):
        check_is_fitted(self, ["components_"])
        return np.clip(np.asarray(W) @ self.components_, 0.0, 1.0)


# ------------------------------------------------------------------ logPCA
@partial(jax.jit, static_argnames=("k", "max_iter", "masked"))
def _lsvd_core(Ym, Mask, A0, B0, tol, *, k: int, max_iter: int, masked: bool):
    """Logistic SVD by MM (Landgraf & Lee 2020): minimize the masked
    Bernoulli NLL of ``sigmoid(1 mu^T + A B^T)`` over ``mu`` (column main
    effects), free scores ``A (m, k)`` and loadings ``B (n, k)``.

    Each iteration majorizes the NLL at the current natural parameter
    ``Theta`` with the quadratic bound (Hessian <= 1/4):
      Z  = Theta + 4 * mask * (Y - sigmoid(Theta))   # working variable
      mu = colmean(Z - A B^T)
      A B^T = rank-k truncated SVD of (Z - 1 mu^T)
    One dense SVD per iteration — XLA-native (QDWH on TPU); every other op
    is a fused elementwise pass or a matmul.
    """
    n_obs = jnp.sum(Mask) if masked else jnp.array(
        Ym.shape[0] * Ym.shape[1], Ym.dtype
    )

    def theta(carry):
        mu, A, B = carry
        return mu[None, :] + A @ B.T

    def step(carry):
        mu, A, B = carry
        Th = theta(carry)
        G = Ym - jax.nn.sigmoid(Th)
        if masked:
            G = Mask * G
        Z = Th + 4.0 * G
        mu_new = jnp.mean(Z - A @ B.T, axis=0)
        U, S, Vt = jnp.linalg.svd(Z - mu_new[None, :], full_matrices=False)
        A_new = U[:, :k] * S[:k]
        B_new = Vt[:k].T
        return (mu_new, A_new, B_new)

    def loss_fn(carry):
        Th = theta(carry)
        # Stable masked Bernoulli NLL with logits: softplus(Th) - y*Th.
        ll = jax.nn.softplus(Th) - Ym * Th
        if masked:
            ll = Mask * ll
        return jnp.sum(ll) / n_obs

    mu0 = jnp.zeros((Ym.shape[1],), dtype=Ym.dtype)
    (mu, A, B), losses, n_iter, done = _signed_stop_loop(
        step, loss_fn, (mu0, A0, B0), tol, max_iter
    )
    return mu, A, B, losses, n_iter, done


class LogisticPCA:
    """The paper's "logPCA" baseline: rank-k logistic SVD
    ``V ~ Bernoulli(sigmoid(1 mu^T + A B^T))`` fit by MM (see module
    docstring for the artifact identification).  On the committed animals
    split this reproduces the stored run: 557 vs 556 iterations, final
    train NLL 0.29230 vs 0.29223, test NLL 0.6478 vs 0.6502 +- 0.0007.
    """

    def __init__(self, n_components=10, max_iter=1000, tol=1e-5,
                 random_state=None, dtype=None):
        self.n_components = n_components
        self.max_iter = max_iter
        self.tol = tol
        self.random_state = random_state
        self.dtype = dtype

    def fit(self, X, y=None, mask=None):
        X = densify(check_array(X, dtype=np.float64))
        dtype = _resolve_dtype(self.dtype)
        m, n = X.shape
        k = self.n_components
        key = jax.random.PRNGKey(0 if self.random_state is None else int(self.random_state))
        kw_, kh_ = jax.random.split(key)
        A0 = 0.1 * jax.random.normal(kw_, (m, k), dtype=dtype)
        B0 = 0.1 * jax.random.normal(kh_, (n, k), dtype=dtype)
        Xd = jnp.asarray(X, dtype=dtype)
        masked = mask is not None
        if masked:
            Mask = jnp.asarray(densify(mask), dtype=dtype)
            Ym = Xd * Mask
        else:
            Mask = jnp.ones((1, 1), dtype=dtype)  # unused placeholder
            Ym = Xd
        mu, A, B, losses, n_iter, done = _lsvd_core(
            Ym, Mask, A0, B0, jnp.array(self.tol, dtype=dtype),
            k=k, max_iter=self.max_iter, masked=masked,
        )
        self.mu_ = np.asarray(mu)
        self.W_ = np.asarray(A)
        self.components_ = np.asarray(B).T  # (k, n)
        self.n_iter_ = int(n_iter)
        self.loss_curve_ = [float(x) for x in np.asarray(losses)[: self.n_iter_]]
        self.loss_ = self.loss_curve_[-1] if self.loss_curve_ else np.inf
        self.converged_ = bool(done)
        return self

    def reconstruction(self):
        check_is_fitted(self, ["components_"])
        return _stable_sigmoid(self.mu_[None, :] + self.W_ @ self.components_)

    def inverse_transform(self, W):
        check_is_fitted(self, ["components_"])
        return _stable_sigmoid(self.mu_[None, :] + np.asarray(W) @ self.components_)


def _stable_sigmoid(theta):
    """Overflow-free sigmoid on the host."""
    out = np.empty_like(theta, dtype=np.float64)
    pos = theta >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-theta[pos]))
    e = np.exp(theta[~pos])
    out[~pos] = e / (1.0 + e)
    return out
