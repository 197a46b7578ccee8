"""Comparison baselines from Magron & Fevotte (2022): NBMF-EM and logPCA.

The reference library ships only NBMF-MM and compares against *stored
artifacts* of these two methods (``outputs/magron2022/<ds>/{NBMF-EM,logPCA}_
test_init.npz`` there).  Implementing them makes the paper's Figure-2
comparison fully reproducible from scratch — and both map naturally onto the
same TPU machinery:

- :class:`NBMFEM` — the expectation-maximization algorithm for the same
  mean-parameterized model (the "aspect Bernoulli" EM of Bingham et al.,
  2009, the paper's NBMF-EM): closed-form multiplicative updates that
  *jointly* refresh W and H from the old pair, monotone in the (masked)
  log-likelihood.  Runs in the same compiled ``lax.while_loop`` as the MM
  solver (:func:`nbmf_mm_tpu.solver.driver._mm_loop`).
- :class:`LogisticPCA` — rank-k logistic PCA ``V ~ Bernoulli(sigmoid(W H))``
  fit by full-batch Adam on the masked Bernoulli NLL (optax), with the
  optimization loop under one ``lax.scan``.

Both expose a compact sklearn-ish surface (``fit``, ``inverse_transform``,
``reconstruction()``, ``loss_curve_``, ``n_iter_``) sufficient for the
benchmark pipeline; they are deliberately not drop-ins for ``NBMF``'s full
reference contract.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ..solver.driver import _mm_loop, _resolve_dtype, _resolve_precision
from ..utils.validation import check_array, check_is_fitted, densify

__all__ = ["NBMFEM", "LogisticPCA"]


# ------------------------------------------------------------------ NBMF-EM
@partial(jax.jit, static_argnames=("max_iter", "precision"))
def _em_core(Ym, Ym2, W0, H0, tol, eps, n_obs, *, max_iter: int, precision):
    """EM loop in internal layout (W (k, m) columns sum to 1, H (k, n)).

    One EM iteration (aspect-Bernoulli E+M steps in matrix form, masked):
      A = Ym / (WH + eps),  B = Ym2 / (1 - WH + eps)
      H <- H (*) (W A) / (H (*) (W A) + (1-H) (*) (W B))
      W <- (1/n) W (*) (A H^T + B (1-H)^T)     [then column renormalize]
    Both updates read the OLD (W, H) — that is the EM/MM difference.
    """
    dot = partial(jnp.matmul, precision=precision)
    n_real = Ym.shape[1]

    def sweep(W, H):
        WH = dot(W.T, H)
        A = Ym / (WH + eps)
        B = Ym2 / (1.0 - WH + eps)
        WA = dot(W, A)
        WB = dot(W, B)
        num = H * WA
        H_new = jnp.clip(num / (num + (1.0 - H) * WB + eps), eps, 1.0 - eps)
        T = dot(H, A.T) + dot(1.0 - H, B.T)
        W_new = W * T / n_real
        col = W_new.sum(axis=0, keepdims=True)
        W_new = W_new / jnp.where(col > 0, col, 1.0)
        return W_new, H_new

    def objective(W, H):
        WH = dot(W.T, H)
        ll = Ym * jnp.log(WH + eps) + Ym2 * jnp.log(1.0 - WH + eps)
        return -jnp.sum(ll) / n_obs

    return _mm_loop(sweep, objective, W0, H0, tol, max_iter=max_iter, verbose=0)


class NBMFEM:
    """Mean-parameterized Bernoulli factorization by EM (paper baseline).

    Same model and constraints as ``NBMF`` (beta-dir orientation: W rows on
    the simplex, H in (0,1)), no Beta prior, EM updates.  Monotonically
    decreases the masked mean Bernoulli NLL.
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

        key = jax.random.PRNGKey(0 if self.random_state is None else int(self.random_state))
        kw_, kh_ = jax.random.split(key)
        W0 = jax.random.uniform(kw_, (k, m), dtype=dtype, minval=0.1, maxval=0.9)
        W0 = W0 / W0.sum(axis=0, keepdims=True)
        H0 = jax.random.uniform(kh_, (k, n), dtype=dtype, minval=0.1, maxval=0.9)

        Xd = jnp.asarray(X, dtype=dtype)
        if mask is None:
            Ym, Ym2 = Xd, 1.0 - Xd
            n_obs = jnp.array(X.size, dtype=dtype)
        else:
            md = jnp.asarray(densify(mask), dtype=dtype)
            Ym, Ym2 = Xd * md, (1.0 - Xd) * md
            n_obs = jnp.count_nonzero(md).astype(dtype)

        W, H, losses, n_iter, final_loss, done = _em_core(
            Ym, Ym2, W0, H0,
            jnp.array(self.tol, dtype=dtype), jnp.array(self.eps, dtype=dtype),
            n_obs, max_iter=self.max_iter, precision=precision,
        )
        self.W_ = np.asarray(W).T
        self.components_ = np.asarray(H)
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
@partial(jax.jit, static_argnames=("max_iter", "lr"))
def _logpca_core(Ym, Mask, W0, H0, *, max_iter: int, lr: float):
    """Full-batch Adam on the masked logistic Bernoulli NLL.

    Natural parameter ``Theta = W H``; ``P = sigmoid(Theta)``.  The loop is
    one ``lax.scan`` (fixed step count; logPCA in the paper also runs a
    fixed/iteration-counted scheme).
    """
    import optax

    n_obs = jnp.sum(Mask)

    def nll(params):
        W, H = params
        theta = W @ H
        # masked Bernoulli NLL with logits (numerically stable):
        # -[y log p + (1-y) log(1-p)] = softplus(theta) - y * theta
        ll = Mask * (jax.nn.softplus(theta) - Ym * theta)
        return jnp.sum(ll) / n_obs

    opt = optax.adam(lr)
    params = (W0, H0)
    state = opt.init(params)

    def step(carry, _):
        params, state = carry
        loss, grads = jax.value_and_grad(nll)(params)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
        return (params, state), loss

    (params, _), losses = jax.lax.scan(step, (params, state), None, length=max_iter)
    return params[0], params[1], losses


class LogisticPCA:
    """Rank-k logistic PCA ``V ~ Bernoulli(sigmoid(W H))`` (paper baseline)."""

    def __init__(self, n_components=10, max_iter=500, lr=0.05,
                 random_state=None, dtype=None):
        self.n_components = n_components
        self.max_iter = max_iter
        self.lr = lr
        self.random_state = random_state
        self.dtype = dtype

    def fit(self, X, y=None, mask=None):
        X = densify(check_array(X, dtype=np.float64))
        dtype = _resolve_dtype(self.dtype)
        m, n = X.shape
        k = self.n_components
        key = jax.random.PRNGKey(0 if self.random_state is None else int(self.random_state))
        kw_, kh_ = jax.random.split(key)
        W0 = 0.1 * jax.random.normal(kw_, (m, k), dtype=dtype)
        H0 = 0.1 * jax.random.normal(kh_, (k, n), dtype=dtype)
        Xd = jnp.asarray(X, dtype=dtype)
        Mask = (
            jnp.ones_like(Xd)
            if mask is None
            else jnp.asarray(densify(mask), dtype=dtype)
        )
        W, H, losses = _logpca_core(
            Xd, Mask, W0, H0, max_iter=self.max_iter, lr=float(self.lr)
        )
        self.W_ = np.asarray(W)
        self.components_ = np.asarray(H)
        self.loss_curve_ = [float(x) for x in np.asarray(losses)]
        self.loss_ = self.loss_curve_[-1]
        self.n_iter_ = self.max_iter
        return self

    def reconstruction(self):
        check_is_fitted(self, ["components_"])
        return _stable_sigmoid(self.W_ @ self.components_)

    def inverse_transform(self, W):
        check_is_fitted(self, ["components_"])
        return _stable_sigmoid(np.asarray(W) @ self.components_)


def _stable_sigmoid(theta):
    """Overflow-free sigmoid on the host."""
    out = np.empty_like(theta, dtype=np.float64)
    pos = theta >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-theta[pos]))
    e = np.exp(theta[~pos])
    out[~pos] = e / (1.0 + e)
    return out
