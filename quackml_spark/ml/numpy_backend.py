"""Numpy long-tail backend — driver-side fit, distributed serving.

The reference executes its long-tail algorithms single-node through
sklearn-over-PyO3 (src/bindings/sklearn/mod.rs:132-179, inventory
sklearn.py:37-99). This container has no sklearn, so without this module
those algorithms exist only behind an import gate that can never fire.
Here the classical members of that inventory are re-implemented directly
on numpy — the SAME objectives, fit on the driver under the same row
budget, served distributed through the same Arrow-batched pandas-UDF
shape as the sklearn backend. Resolution order (ml/algorithms.py):
native MLlib first, sklearn when importable, then THIS backend — so with
sklearn installed these never shadow it.

Exactness notes (what the tests pin):
  * least_angle (LARS, Efron et al. 2004): at the end of the path on a
    full-rank design it EQUALS closed-form OLS — value-checked against
    the DuckDB normal-equations oracle.
  * lasso/elastic-net coordinate descent minimize the sklearn objective
    1/(2n)·||y-Xw||² + α·(l1·||w||₁ + (1-l1)/2·||w||²).
  * perceptron on separable data reaches a separating hyperplane
    (Novikoff) — value-checked by predicting a deterministic label rule.
  * bayesian_ridge/ARD follow the evidence-maximization iterations
    (MacKay 1992), kernel_ridge/GP-mean the standard dual closed forms.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from quackml_spark.catalog import Algorithm, Task

ROW_BUDGET = int(os.environ.get("QML_NUMPY_ROW_BUDGET", "2000000"))


# ---------------------------------------------------------------------------
# fitters — X:(n,d) float64, y:(n,) float64; return dict of parameters.
# All deterministic: fixed iteration counts/orders, seeded RNG only.
# ---------------------------------------------------------------------------


def _ols(X: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, float]:
    Xb = np.hstack([X, np.ones((len(X), 1))])
    beta, *_ = np.linalg.lstsq(Xb, y, rcond=None)
    return beta[:-1], float(beta[-1])


def _fit_lars(X, y, hp, seed):
    """Least-angle regression, full path (or n_nonzero_coefs cut)."""
    n, d = X.shape
    n_active_max = int(hp.get("n_nonzero_coefs", 0) or min(d, n - 1))
    xm, ym = X.mean(axis=0), y.mean()
    Xc, yc = X - xm, y - ym
    coef = np.zeros(d)
    active: list[int] = []
    mu = np.zeros(n)
    for _ in range(n_active_max):
        c = Xc.T @ (yc - mu)
        inactive = [j for j in range(d) if j not in active]
        if not inactive:
            break
        j_best = max(inactive, key=lambda j: abs(c[j]))
        if abs(c[j_best]) < 1e-12:
            break
        active.append(j_best)
        # equiangular direction over the active set
        Xa = Xc[:, active] * np.sign(c[active])
        G = Xa.T @ Xa
        Ginv1 = np.linalg.solve(G, np.ones(len(active)))
        A = 1.0 / np.sqrt(np.ones(len(active)) @ Ginv1)
        w = A * Ginv1
        u = Xa @ w
        a = Xc.T @ u
        C = abs(c[active[0]]) if len(active) == 1 else np.abs(c[active]).max()
        if len(active) == min(d, n - 1):
            # true path END: no competitor can enter — the full OLS jump
            # is the last knot. An n_nonzero_coefs cut must NOT take
            # this jump: sklearn stops at the knot where the next
            # variable would enter, and jumping to OLS there returned
            # systematically larger coefficients (review catch); the
            # competitor-gamma branch below handles the cut correctly
            # (no inactive competitors -> it falls back to C/A anyway).
            gamma = C / A
        else:
            gammas = []
            for j in range(d):
                if j in active:
                    continue
                for g in ((C - c[j]) / (A - a[j]), (C + c[j]) / (A + a[j])):
                    if g > 1e-12:
                        gammas.append(g)
            gamma = min(gammas) if gammas else C / A
        mu = mu + gamma * u
        for idx, j in enumerate(active):
            coef[j] += gamma * w[idx] * np.sign(c[j])
    return {"kind": "linear", "coef": coef, "intercept": float(ym - xm @ coef)}


def _fit_lasso_lars(X, y, hp, seed):
    """LassoLars: LARS with the lasso modification (Efron et al. 2004
    §3.1) — a step is truncated when an active coefficient would cross
    zero (the variable drops and may rejoin later), and the path stops
    exactly at the requested penalty (max correlation == n*alpha, the
    sklearn LassoLars objective (1/2n)||y-Xw||^2 + alpha*||w||_1).
    The true path algorithm, not a coordinate-descent stand-in; its
    solution is cross-checked against CD on the same convex objective
    in tests."""
    alpha = float(hp.get("alpha", 1.0))
    n, d = X.shape
    xm, ym = X.mean(axis=0), y.mean()
    Xc, yc = X - xm, y - ym
    coef = np.zeros(d)
    active: list[int] = []
    mu = np.zeros(n)
    target_C = alpha * n
    just_dropped = False
    for _ in range(8 * d + 8):
        c = Xc.T @ (yc - mu)
        C = float(np.abs(c).max()) if d else 0.0
        if C <= target_C + 1e-12:
            break
        inactive = [j for j in range(d) if j not in active]
        if inactive and not just_dropped:
            j_best = max(inactive, key=lambda j: abs(c[j]))
            if abs(c[j_best]) >= (np.abs(c[active]).max() if active else 0.0) - 1e-9:
                active.append(j_best)
        just_dropped = False
        if not active:
            break
        s = np.sign(c[active])
        Xa = Xc[:, active] * s
        G = Xa.T @ Xa
        Ginv1 = np.linalg.solve(G, np.ones(len(active)))
        A = 1.0 / np.sqrt(np.ones(len(active)) @ Ginv1)
        w = A * Ginv1
        u = Xa @ w
        a = Xc.T @ u
        gammas = []
        for j in range(d):
            if j in active:
                continue
            for g in ((C - c[j]) / (A - a[j]), (C + c[j]) / (A + a[j])):
                if g > 1e-12:
                    gammas.append(float(g))
        gamma = min(gammas) if gammas else C / A
        drop_j, gamma_drop = None, np.inf
        for idx, j in enumerate(active):
            denom = w[idx] * s[idx]
            if denom != 0.0:
                g = -coef[j] / denom
                if 1e-12 < g < gamma_drop:
                    gamma_drop, drop_j = float(g), j
        gamma_alpha = (C - target_C) / A
        step = min(gamma, gamma_drop, gamma_alpha)
        mu = mu + step * u
        for idx, j in enumerate(active):
            coef[j] += step * w[idx] * s[idx]
        if step == gamma_alpha:
            break
        if step == gamma_drop:
            coef[drop_j] = 0.0
            active.remove(drop_j)
            just_dropped = True
    return {"kind": "linear", "coef": coef, "intercept": float(ym - xm @ coef)}


def _fit_cd(X, y, alpha, l1_ratio, max_iter=2000, tol=1e-10):
    """Coordinate descent for the sklearn elastic-net objective."""
    n, d = X.shape
    xm, ym = X.mean(axis=0), y.mean()
    Xc, yc = X - xm, y - ym
    col_sq = (Xc**2).sum(axis=0)
    w = np.zeros(d)
    r = yc.copy()
    l1 = alpha * l1_ratio * n
    l2 = alpha * (1.0 - l1_ratio) * n
    for _ in range(max_iter):
        w_max = d_max = 0.0
        for j in range(d):
            if col_sq[j] == 0.0:
                continue
            wj = w[j]
            rho = Xc[:, j] @ r + col_sq[j] * wj
            wn = np.sign(rho) * max(abs(rho) - l1, 0.0) / (col_sq[j] + l2)
            if wn != wj:
                r += Xc[:, j] * (wj - wn)
                w[j] = wn
                d_max = max(d_max, abs(wn - wj))
            w_max = max(w_max, abs(wn))
        if w_max == 0.0 or d_max / max(w_max, 1e-30) < tol:
            break
    return {"kind": "linear", "coef": w, "intercept": float(ym - xm @ w)}


def _fit_omp(X, y, hp, seed):
    """Orthogonal matching pursuit (greedy residual correlation)."""
    n, d = X.shape
    k = int(hp.get("n_nonzero_coefs", 0) or max(1, d // 10))
    xm, ym = X.mean(axis=0), y.mean()
    Xc, yc = X - xm, y - ym
    norms = np.sqrt((Xc**2).sum(axis=0))
    norms[norms == 0] = 1.0
    active: list[int] = []
    r = yc.copy()
    coef = np.zeros(d)
    for _ in range(min(k, d)):
        corr = np.abs(Xc.T @ r) / norms
        corr[active] = -1.0
        j = int(corr.argmax())
        if corr[j] <= 1e-12:
            break
        active.append(j)
        sol, *_ = np.linalg.lstsq(Xc[:, active], yc, rcond=None)
        r = yc - Xc[:, active] @ sol
    if active:
        coef[active] = sol
    return {"kind": "linear", "coef": coef, "intercept": float(ym - xm @ coef)}


def _fit_bayesian_ridge(X, y, hp, seed, ard=False, max_iter=300, tol=1e-8):
    """Evidence-maximization (MacKay); ``ard`` switches to per-weight
    precisions (automatic relevance determination)."""
    n, d = X.shape
    xm, ym = X.mean(axis=0), y.mean()
    Xc, yc = X - xm, y - ym
    XtX, Xty = Xc.T @ Xc, Xc.T @ yc
    alpha_ = 1.0 / max(np.var(yc), 1e-12)  # noise precision
    lam = np.ones(d) if ard else np.ones(1)  # weight precision(s)
    w = np.zeros(d)
    for _ in range(max_iter):
        A = alpha_ * XtX + np.diag(np.broadcast_to(lam, (d,)).copy())
        w_new = alpha_ * np.linalg.solve(A, Xty)
        Sigma = np.linalg.inv(A)
        gamma_i = 1.0 - np.broadcast_to(lam, (d,)) * np.diag(Sigma)
        if ard:
            lam = gamma_i.clip(1e-12) / (w_new**2 + 1e-24)
            lam = lam.clip(max=1e10)
        else:
            lam = np.array([gamma_i.sum().clip(1e-12) / (w_new @ w_new + 1e-24)])
        resid = yc - Xc @ w_new
        alpha_ = max(n - gamma_i.sum(), 1e-12) / max(resid @ resid, 1e-24)
        if np.abs(w_new - w).max() < tol:
            w = w_new
            break
        w = w_new
    return {"kind": "linear", "coef": w, "intercept": float(ym - xm @ w)}


def _fit_pa_regressor(X, y, hp, seed, epochs=20):
    """Passive-aggressive regression (PA-I, Crammer et al. 2006)."""
    C = float(hp.get("C", 1.0))
    eps = float(hp.get("epsilon", 0.1))
    d = X.shape[1]
    w, b = np.zeros(d), 0.0
    for _ in range(epochs):
        for i in range(len(X)):
            xi, yi = X[i], y[i]
            err = (w @ xi + b) - yi
            loss = max(0.0, abs(err) - eps)
            if loss > 0.0:
                tau = min(C, loss / (xi @ xi + 1.0))
                step = -np.sign(err) * tau
                w = w + step * xi
                b = b + step
    return {"kind": "linear", "coef": w, "intercept": float(b)}


def _fit_sgd_regressor(X, y, hp, seed, epochs=200):
    """Deterministic full-pass SGD on squared loss + l2 (invscaling lr)."""
    alpha = float(hp.get("alpha", 1e-4))
    eta0 = float(hp.get("eta0", 0.01))
    d = X.shape[1]
    w, b = np.zeros(d), 0.0
    t = 0
    for _ in range(epochs):
        for i in range(len(X)):
            t += 1
            eta = eta0 / (t**0.25)
            err = (w @ X[i] + b) - y[i]
            w = w - eta * (err * X[i] + alpha * w)
            b = b - eta * err
    return {"kind": "linear", "coef": w, "intercept": float(b)}


def _fit_sgd_classifier(X, y, hp, seed, epochs=200):
    """SGD hinge + l2 (sklearn SGDClassifier's default objective,
    `sklearn.py:50`), one-vs-rest for multiclass, deterministic
    full-pass order with the 'optimal' eta = 1/(alpha*(t+t0))
    schedule's shape (t0 folded into t for determinism)."""
    alpha = float(hp.get("alpha", 1e-4))
    classes = np.unique(y)
    d = X.shape[1]
    W = np.zeros((len(classes), d))
    B = np.zeros(len(classes))
    for ci, c in enumerate(classes):
        t_ = np.where(y == c, 1.0, -1.0)
        w, b, t = np.zeros(d), 0.0, 0
        for _ in range(epochs):
            for i in range(len(X)):
                t += 1
                eta = 1.0 / (alpha * (t + 1.0 / alpha))
                margin = t_[i] * (w @ X[i] + b)
                w = w - eta * alpha * w
                if margin < 1:
                    w = w + eta * t_[i] * X[i]
                    b = b + eta * t_[i]
        W[ci], B[ci] = w, b
    return {
        "kind": "linear_clf",
        "coef": W,
        "intercept": B,
        "classes": classes.astype("float64"),
    }


def _fit_huber(X, y, hp, seed, max_iter=200, tol=1e-12):
    """Huber M-estimation via IRLS (on zero-outlier data == OLS)."""
    epsilon = float(hp.get("epsilon", 1.35))
    n, d = X.shape
    Xb = np.hstack([X, np.ones((n, 1))])
    beta, *_ = np.linalg.lstsq(Xb, y, rcond=None)
    for _ in range(max_iter):
        r = y - Xb @ beta
        scale = max(np.median(np.abs(r)) / 0.6745, 1e-12)
        a = np.abs(r) / scale
        wts = np.where(a <= epsilon, 1.0, epsilon / np.maximum(a, 1e-30))
        WX = Xb * wts[:, None]
        beta_new = np.linalg.solve(Xb.T @ WX + 1e-12 * np.eye(d + 1), WX.T @ y)
        if np.abs(beta_new - beta).max() < tol:
            beta = beta_new
            break
        beta = beta_new
    return {"kind": "linear", "coef": beta[:-1], "intercept": float(beta[-1])}


def _fit_quantile(X, y, hp, seed, max_iter=500, tol=1e-10):
    """Quantile regression via smoothed-pinball IRLS (numpy-approx)."""
    q = float(hp.get("quantile", 0.5))
    n, d = X.shape
    Xb = np.hstack([X, np.ones((n, 1))])
    beta, *_ = np.linalg.lstsq(Xb, y, rcond=None)
    for _ in range(max_iter):
        r = y - Xb @ beta
        wts = np.where(r >= 0, q, 1.0 - q) / np.maximum(np.abs(r), 1e-8)
        WX = Xb * wts[:, None]
        beta_new = np.linalg.solve(Xb.T @ WX + 1e-10 * np.eye(d + 1), WX.T @ y)
        if np.abs(beta_new - beta).max() < tol:
            beta = beta_new
            break
        beta = beta_new
    return {"kind": "linear", "coef": beta[:-1], "intercept": float(beta[-1])}


def _fit_ransac(X, y, hp, seed, n_trials=100):
    """RANSAC with OLS base; MAD-of-residuals inlier threshold."""
    rng = np.random.default_rng(seed)
    n, d = X.shape
    min_samples = max(d + 1, int(hp.get("min_samples", 0) or d + 1))
    coef0, b0 = _ols(X, y)
    resid0 = np.abs(y - (X @ coef0 + b0))
    thresh = float(hp.get("residual_threshold", 0) or max(np.median(resid0), 1e-9))
    best_mask, best_n = None, -1
    for _ in range(n_trials):
        idx = rng.choice(n, size=min(min_samples, n), replace=False)
        try:
            c, b = _ols(X[idx], y[idx])
        except np.linalg.LinAlgError:
            continue
        mask = np.abs(y - (X @ c + b)) <= thresh
        if mask.sum() > best_n:
            best_n, best_mask = int(mask.sum()), mask
    if best_mask is None or best_n < min_samples:
        best_mask = np.ones(n, dtype=bool)
    coef, b = _ols(X[best_mask], y[best_mask])
    return {"kind": "linear", "coef": coef, "intercept": b}


def _fit_theil_sen(X, y, hp, seed, n_subsets=300, weiszfeld_iter=100):
    """Theil–Sen: spatial median of OLS fits on random minimal subsets."""
    rng = np.random.default_rng(seed)
    n, d = X.shape
    k = min(n, d + 1)
    sols = []
    for _ in range(n_subsets):
        idx = rng.choice(n, size=k, replace=False)
        try:
            c, b = _ols(X[idx], y[idx])
            sols.append(np.append(c, b))
        except np.linalg.LinAlgError:
            continue
    P = np.array(sols)
    med = np.median(P, axis=0)
    for _ in range(weiszfeld_iter):  # spatial median (Weiszfeld)
        dist = np.linalg.norm(P - med, axis=1).clip(1e-12)
        new = (P / dist[:, None]).sum(axis=0) / (1.0 / dist).sum()
        if np.linalg.norm(new - med) < 1e-12:
            med = new
            break
        med = new
    return {"kind": "linear", "coef": med[:-1], "intercept": float(med[-1])}


def _rbf(A, B, gamma):
    sq = (A**2).sum(1)[:, None] + (B**2).sum(1)[None, :] - 2.0 * (A @ B.T)
    return np.exp(-gamma * np.maximum(sq, 0.0))


def _fit_kernel_ridge(X, y, hp, seed):
    """Kernel ridge (dual closed form, RBF or linear kernel)."""
    alpha = float(hp.get("alpha", 1.0))
    kernel = hp.get("kernel", "rbf")
    gamma = float(hp.get("gamma", 0) or 1.0 / X.shape[1])
    K = _rbf(X, X, gamma) if kernel == "rbf" else X @ X.T
    dual = np.linalg.solve(K + alpha * np.eye(len(X)), y)
    return {
        "kind": "kernel",
        "X_train": X,
        "dual": dual,
        "kernel": kernel,
        "gamma": gamma,
        "y_offset": 0.0,
    }


def _fit_svr(X, y, hp, seed, max_iter=40000, tol=1e-12):
    """Exact epsilon-SVR (the sklearn/libsvm objective): minimize
    1/2 (a-s)'K(a-s) - y'(a-s) + eps*sum(a+s) over 0 <= a, s <= C with
    sum(a - s) = 0 — the smooth two-block dual, solved by
    FISTA-accelerated projected gradient. The projection onto
    box-intersect-hyperplane is exact (one bisection on the hyperplane
    multiplier per step), the step size is 1/L with L = 2*lambda_max(K)
    from power iteration, and the intercept comes from the KKT
    conditions of the free vectors. Exactness is pinned by direct KKT
    verification in tests (tube geometry: free vectors ON the eps-tube
    boundary, zero-dual points inside, bound points outside)."""
    C = float(hp.get("C", 1.0))
    eps = float(hp.get("epsilon", 0.1))
    kernel = hp.get("kernel", "rbf")
    gamma = float(hp.get("gamma", 0) or 1.0 / X.shape[1])
    n = len(X)
    K = _rbf(X, X, gamma) if kernel == "rbf" else X @ X.T

    # lambda_max(K) via power iteration (K is PSD)
    rng = np.random.default_rng(seed)
    v = rng.normal(size=n)
    v /= np.linalg.norm(v)
    for _ in range(100):
        w = K @ v
        nw = np.linalg.norm(w)
        if nw < 1e-30:
            break
        v = w / nw
    L = 2.0 * max(float(v @ (K @ v)), 1e-12)

    def project(a0, s0):
        # min ||a-a0||^2+||s-s0||^2 s.t. 0<=a,s<=C, sum(a)-sum(s)=0:
        # a = clip(a0-mu,0,C), s = clip(s0+mu,0,C); h(mu) monotone.
        def h(mu):
            return np.clip(a0 - mu, 0.0, C).sum() - np.clip(s0 + mu, 0.0, C).sum()

        lo, hi = -C - 1.0, C + 1.0
        while h(lo) < 0:
            lo *= 2.0
        while h(hi) > 0:
            hi *= 2.0
        for _ in range(100):
            mid = 0.5 * (lo + hi)
            if h(mid) > 0:
                lo = mid
            else:
                hi = mid
        mu = 0.5 * (lo + hi)
        return np.clip(a0 - mu, 0.0, C), np.clip(s0 + mu, 0.0, C)

    a = np.zeros(n)
    s_ = np.zeros(n)
    ya, ys = a.copy(), s_.copy()
    t_acc = 1.0
    last_obj = np.inf
    stall = 0
    for it in range(max_iter):
        beta = ya - ys
        Kb = K @ beta
        ga = Kb - y + eps
        gs = -Kb + y + eps
        an, sn = project(ya - ga / L, ys - gs / L)
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t_acc * t_acc))
        ya = an + ((t_acc - 1.0) / t_new) * (an - a)
        ys = sn + ((t_acc - 1.0) / t_new) * (sn - s_)
        a, s_, t_acc = an, sn, t_new
        if it % 50 == 0:
            b = a - s_
            obj = 0.5 * b @ (K @ b) - y @ b + eps * (a + s_).sum()
            if last_obj - obj < tol * max(1.0, abs(obj)):
                stall += 1
                if stall >= 3:
                    break
            else:
                stall = 0
            last_obj = min(last_obj, obj)

    b = a - s_
    E = K @ b
    free = ((a > 1e-7) & (a < C - 1e-7)) | ((s_ > 1e-7) & (s_ < C - 1e-7))
    if free.any():
        b0 = float(np.mean(y[free] - E[free] - eps * np.sign(b[free])))
    else:
        b0 = float(np.mean(y - E))
    return {
        "kind": "kernel",
        "X_train": X,
        "dual": b,
        "kernel": kernel,
        "gamma": gamma,
        "y_offset": b0,
    }


def _fit_gp_regressor(X, y, hp, seed):
    """GP regression predictive mean (RBF kernel + noise) — identical
    dual form to kernel ridge with the noise term as regularizer."""
    noise = float(hp.get("alpha", 1e-10))
    ls = float(hp.get("length_scale", 1.0))
    gamma = 1.0 / (2.0 * ls * ls)
    ym = y.mean()
    K = _rbf(X, X, gamma)
    dual = np.linalg.solve(K + max(noise, 1e-10) * np.eye(len(X)), y - ym)
    return {
        "kind": "kernel",
        "X_train": X,
        "dual": dual,
        "kernel": "rbf",
        "gamma": gamma,
        "y_offset": float(ym),
    }


def _fit_kernel_logistic(X, y, hp, seed, iters=300):
    """Kernel logistic regression (RBF) — the numpy stand-in for GP
    classification (the GP posterior mode under a logistic likelihood
    IS penalized kernel logistic regression; we fit it by functional
    gradient descent instead of the Laplace approximation)."""
    lam = float(hp.get("alpha", 1e-3))
    ls = float(hp.get("length_scale", 1.0))
    gamma = 1.0 / (2.0 * ls * ls)
    classes = np.unique(y)
    K = _rbf(X, X, gamma)
    machines = []
    targets = [classes[1]] if len(classes) == 2 else classes
    for cls in targets:
        t = np.where(y == cls, 1.0, -1.0)
        beta = np.zeros(len(X))
        b = 0.0
        for i in range(1, iters + 1):
            f = K @ beta + b
            sig = 1.0 / (1.0 + np.exp(np.clip(t * f, -500, 500)))
            g = -t * sig  # d loss / d f
            step = 2.0 / (i**0.5 + 10.0)
            beta -= step * (g / len(X) + lam * beta)
            b -= step * float(g.mean())
        machines.append({"sv": X, "coef": beta, "b": b})
    return {
        "kind": "svm",  # same serving shape: kernel expansion + sign/argmax
        "machines": machines,
        "classes": classes,
        "kernel": "rbf",
        "gamma": gamma,
    }


def _fit_svc(X, y, hp, seed, max_passes=8, tol=1e-4):
    """C-SVM classification via simplified SMO (Platt 1998 as in the
    CS229 simplification, with deterministic j-selection by max
    |E_i−E_j|). Kernel: rbf (default) or linear. Multiclass one-vs-all.
    Stores support vectors + duals; O(n²) kernel — driver row budget."""
    C = float(hp.get("C", 1.0))
    kernel = hp.get("kernel", "rbf")
    gamma = float(hp.get("gamma", 0) or 1.0 / (X.shape[1] * max(X.var(), 1e-12)))
    classes = np.unique(y)

    def kmat(A, B):
        return _rbf(A, B, gamma) if kernel == "rbf" else A @ B.T

    def smo_binary(t):
        n = len(X)
        K = kmat(X, X)
        alpha = np.zeros(n)
        b = 0.0
        passes = 0
        while passes < max_passes:
            changed = 0
            E = (alpha * t) @ K + b - t
            for i in range(n):
                Ei = float((alpha * t) @ K[:, i] + b - t[i])
                if (t[i] * Ei < -tol and alpha[i] < C) or (t[i] * Ei > tol and alpha[i] > 0):
                    j = int(np.abs(E - Ei).argmax())
                    if j == i:
                        continue
                    Ej = float((alpha * t) @ K[:, j] + b - t[j])
                    ai_old, aj_old = alpha[i], alpha[j]
                    if t[i] != t[j]:
                        L, H = max(0.0, aj_old - ai_old), min(C, C + aj_old - ai_old)
                    else:
                        L, H = max(0.0, ai_old + aj_old - C), min(C, ai_old + aj_old)
                    if L >= H:
                        continue
                    eta = 2.0 * K[i, j] - K[i, i] - K[j, j]
                    if eta >= 0:
                        continue
                    aj = np.clip(aj_old - t[j] * (Ei - Ej) / eta, L, H)
                    if abs(aj - aj_old) < 1e-7:
                        continue
                    ai = ai_old + t[i] * t[j] * (aj_old - aj)
                    alpha[i], alpha[j] = ai, aj
                    b1 = b - Ei - t[i] * (ai - ai_old) * K[i, i] - t[j] * (aj - aj_old) * K[i, j]
                    b2 = b - Ej - t[i] * (ai - ai_old) * K[i, j] - t[j] * (aj - aj_old) * K[j, j]
                    if 0 < ai < C:
                        b = b1
                    elif 0 < aj < C:
                        b = b2
                    else:
                        b = (b1 + b2) / 2.0
                    E = (alpha * t) @ K + b - t
                    changed += 1
            passes = passes + 1 if changed == 0 else 0
        sv = alpha > 1e-8
        return X[sv], (alpha * t)[sv], float(b)

    machines = []
    # binary: one machine (positive class = classes[1]); multiclass: OvA
    targets = [classes[1]] if len(classes) == 2 else classes
    for cls in targets:
        t = np.where(y == cls, 1.0, -1.0)
        sv, coef, b = smo_binary(t)
        machines.append({"sv": sv, "coef": coef, "b": b})
    return {
        "kind": "svm",
        "machines": machines,
        "classes": classes,
        "kernel": kernel,
        "gamma": gamma,
    }


def _fit_linear_svr(X, y, hp, seed, epochs=500):
    """LinearSVR primal: epsilon-insensitive loss + L2, deterministic
    full-batch subgradient descent with decaying step."""
    C = float(hp.get("C", 1.0))
    eps = float(hp.get("epsilon", 0.0))
    n, d = X.shape
    w, b = np.zeros(d), 0.0
    coef0, b0 = _ols(X, y)  # warm start at OLS (inside the eps tube when clean)
    w, b = coef0.copy(), b0
    for t in range(1, epochs + 1):
        r = X @ w + b - y
        g = np.where(r > eps, 1.0, np.where(r < -eps, -1.0, 0.0))
        gw = w / (C * n) + (g @ X) / n
        gb = g.mean()
        step = 0.5 / np.sqrt(t)
        w -= step * gw
        b -= step * gb
    return {"kind": "linear", "coef": w, "intercept": float(b)}


# ---------------------------------------------------------------------------
# CART (greedy binary tree, vectorized threshold scan) — the weak/base
# learner for the ada_boost and bagging ensembles, mirroring sklearn's
# tree defaults (stumps for SAMME, depth-3 for AdaBoost.R2, deep trees
# for bagging). Trees serialize to plain dicts for JSON persistence.
# ---------------------------------------------------------------------------


def _cart_fit(X, y, w, max_depth, min_leaf=1):
    """Weighted greedy CART minimizing weighted squared error (for
    classification callers pass ±1/one-hot targets — variance reduction
    equals gini up to constants for binary targets)."""

    def build(idx, depth):
        yi, wi = y[idx], w[idx]
        wsum = wi.sum()
        mean = float((wi * yi).sum() / wsum)
        if depth == 0 or len(idx) < 2 * min_leaf:
            return {"leaf": mean}
        base_err = float((wi * (yi - mean) ** 2).sum())
        best = None
        for j in range(X.shape[1]):
            xv = X[idx, j]
            order = np.argsort(xv, kind="stable")
            xs, ys, ws = xv[order], yi[order], wi[order]
            cw = np.cumsum(ws)
            cwy = np.cumsum(ws * ys)
            cwy2 = np.cumsum(ws * ys * ys)
            tot_w, tot_wy, tot_wy2 = cw[-1], cwy[-1], cwy2[-1]
            # candidate splits between distinct consecutive values
            cut = np.nonzero(xs[1:] > xs[:-1])[0]
            if len(cut) == 0:
                continue
            lw, lwy, lwy2 = cw[cut], cwy[cut], cwy2[cut]
            rw, rwy, rwy2 = tot_w - lw, tot_wy - lwy, tot_wy2 - lwy2
            ok = (lw > 0) & (rw > 0)
            err = (lwy2 - lwy**2 / np.maximum(lw, 1e-300)) + (
                rwy2 - rwy**2 / np.maximum(rw, 1e-300)
            )
            err = np.where(ok, err, np.inf)
            k = int(err.argmin())
            if err[k] < base_err - 1e-12 and (best is None or err[k] < best[0]):
                thr = (xs[cut[k]] + xs[cut[k] + 1]) / 2.0
                best = (float(err[k]), j, float(thr))
        if best is None:
            return {"leaf": mean}
        _, j, thr = best
        mask = X[idx, j] <= thr
        return {
            "f": j,
            "t": thr,
            "l": build(idx[mask], depth - 1),
            "r": build(idx[~mask], depth - 1),
        }

    return build(np.arange(len(X)), max_depth)


def _cart_predict(tree, X):
    out = np.empty(len(X))

    def walk(node, idx):
        if "leaf" in node:
            out[idx] = node["leaf"]
            return
        mask = X[idx, node["f"]] <= node["t"]
        walk(node["l"], idx[mask])
        walk(node["r"], idx[~mask])

    walk(tree, np.arange(len(X)))
    return out


def _fit_ada_boost_clf(X, y, hp, seed, n_estimators=None):
    """SAMME AdaBoost with stump weak learners (sklearn's default
    base), one-vs-all on the ±1 encoding per class pair via the
    two-class SAMME special case."""
    n_estimators = int(n_estimators or hp.get("n_estimators", 50))
    classes = np.unique(y)
    n = len(X)
    stumps, alphas = [], []
    if len(classes) == 1:
        # constant-label input: a constant model (the OvA recursion
        # below would otherwise see one class forever — code-review
        # catch: RecursionError)
        return {
            "kind": "ensemble",
            "mode": "adaboost_binary",
            "trees": [],
            "weights": [],
            "classes": np.array([classes[0], classes[0]]),
        }
    if len(classes) == 2:
        t = np.where(y == classes[1], 1.0, -1.0)
        w = np.full(n, 1.0 / n)
        for _ in range(n_estimators):
            tree = _cart_fit(X, t, w, max_depth=1)
            pred = np.sign(_cart_predict(tree, X))
            pred[pred == 0] = 1.0
            err = float(w[pred != t].sum())
            if err <= 1e-12:
                stumps.append(tree)
                alphas.append(10.0)  # perfect stump: dominate the vote
                break
            if err >= 0.5:
                break
            a = 0.5 * np.log((1 - err) / err)
            stumps.append(tree)
            alphas.append(float(a))
            w = w * np.exp(-a * t * pred)
            w = w / w.sum()
        if not stumps:
            # first stump already >= 0.5 weighted error (e.g. XOR):
            # keep that single stump rather than silently returning an
            # empty ensemble that votes one class everywhere — the
            # regressor twin has the same fallback
            stumps = [_cart_fit(X, t, np.full(n, 1.0 / n), max_depth=1)]
            alphas = [1.0]
        return {
            "kind": "ensemble",
            "mode": "adaboost_binary",
            "trees": stumps,
            "weights": alphas,
            "classes": classes,
        }
    # multiclass: one-vs-all binary boosters, argmax of scores
    boosters = []
    for cls in classes:
        sub = _fit_ada_boost_clf(
            X, np.where(y == cls, 1.0, 0.0), hp, seed, n_estimators
        )
        boosters.append({"trees": sub["trees"], "weights": sub["weights"]})
    return {
        "kind": "ensemble",
        "mode": "adaboost_ova",
        "boosters": boosters,
        "classes": classes,
    }


def _fit_ada_boost_reg(X, y, hp, seed):
    """AdaBoost.R2 (Drucker 1997) with depth-3 trees, linear loss."""
    n_estimators = int(hp.get("n_estimators", 50))
    n = len(X)
    rng = np.random.default_rng(seed)
    w = np.full(n, 1.0 / n)
    trees, betas = [], []
    for _ in range(n_estimators):
        idx = rng.choice(n, size=n, replace=True, p=w)
        tree = _cart_fit(X[idx], y[idx], np.full(n, 1.0 / n), max_depth=3)
        pred = _cart_predict(tree, X)
        ae = np.abs(pred - y)
        denom = ae.max()
        if denom <= 1e-12:
            trees.append(tree)
            betas.append(1e-12)
            break
        L = ae / denom
        Lbar = float((w * L).sum())
        if Lbar >= 0.5:
            break
        beta = Lbar / (1 - Lbar)
        trees.append(tree)
        betas.append(float(beta))
        w = w * beta ** (1 - L)
        w = w / w.sum()
    if not trees:  # single tree fallback
        trees = [_cart_fit(X, y, np.full(n, 1.0 / n), max_depth=3)]
        betas = [1.0]
    return {"kind": "ensemble", "mode": "adaboost_r2", "trees": trees, "weights": betas}


def _fit_bagging(X, y, hp, seed, classification=False):
    """Bootstrap-aggregated deep CARTs (sklearn's default base is an
    unpruned tree; depth 10 approximates it under the row budget).

    Classification fits ONE INDICATOR TREE PER CLASS per bootstrap
    (y==c -> 1/0) and votes by per-estimator argmax — _cart_fit's own
    contract ('classification callers pass ±1/one-hot targets'). The
    earlier version fit regression CARTs on the RAW ordinal labels, so
    a leaf mixing classes 0 and 2 averaged to 1.0 and predicted class
    1, a class present in neither (review catch); for binary the
    indicator-variance split ranks candidates exactly like gini."""
    n_estimators = int(hp.get("n_estimators", 10))
    max_depth = int(hp.get("max_depth", 10))
    rng = np.random.default_rng(seed)
    n = len(X)
    trees = []
    classes = np.unique(y) if classification else None
    for _ in range(n_estimators):
        idx = rng.choice(n, size=n, replace=True)
        w = np.full(len(idx), 1.0 / len(idx))
        if classification:
            trees.append(
                [
                    _cart_fit(
                        X[idx],
                        (y[idx] == c).astype("float64"),
                        w,
                        max_depth=max_depth,
                    )
                    for c in classes
                ]
            )
        else:
            trees.append(_cart_fit(X[idx], y[idx], w, max_depth=max_depth))
    return {
        "kind": "ensemble",
        "mode": "bagging_clf" if classification else "bagging_reg",
        "trees": trees,
        "weights": [1.0] * len(trees),
        **({"classes": classes} if classification else {}),
    }


def _gini(y):
    _, cnt = np.unique(y, return_counts=True)
    p = cnt / cnt.sum()
    return float(1.0 - (p**2).sum())


def _ert_build(X, y, idx, depth, rng, n_feats, min_leaf, classification):
    """One node of an Extremely Randomized Tree (Geurts et al. 2006):
    draw ``n_feats`` candidate features, ONE uniform-random threshold
    per feature between the node's min/max, keep the best-scoring cut
    (gini for classification, variance for regression). No bootstrap —
    each tree sees the full sample; the randomness is in the splits."""
    yi = y[idx]
    if classification:
        vals, cnts = np.unique(yi, return_counts=True)
        leaf = float(vals[cnts.argmax()])
        pure = len(vals) == 1
    else:
        leaf = float(yi.mean())
        pure = bool(np.all(yi == yi[0]))
    if depth == 0 or len(idx) < 2 * min_leaf or pure:
        return {"leaf": leaf}
    feats = rng.permutation(X.shape[1])[:n_feats]
    best = None
    for j in feats:
        xv = X[idx, j]
        lo, hi = float(xv.min()), float(xv.max())
        if hi <= lo:
            continue
        thr = float(rng.uniform(lo, hi))
        mask = xv <= thr
        nl = int(mask.sum())
        nr = len(idx) - nl
        if nl < min_leaf or nr < min_leaf:
            continue
        if classification:
            score = _gini(yi[mask]) * nl + _gini(yi[~mask]) * nr
        else:
            score = float(yi[mask].var()) * nl + float(yi[~mask].var()) * nr
        if best is None or score < best[0]:
            best = (score, int(j), thr, mask)
    if best is None:
        return {"leaf": leaf}
    _, j, thr, mask = best
    return {
        "f": j,
        "t": thr,
        "l": _ert_build(X, y, idx[mask], depth - 1, rng, n_feats, min_leaf,
                        classification),
        "r": _ert_build(X, y, idx[~mask], depth - 1, rng, n_feats, min_leaf,
                        classification),
    }


def _fit_extra_trees(X, y, hp, seed, classification=False):
    """ExtraTrees{Regressor,Classifier} with the reference's sklearn
    defaults (sklearn.py:37-99): n_estimators=100, no bootstrap,
    max_features=sqrt(d) for classification / all features for
    regression, uniform-random thresholds. Exact algorithm semantics —
    not the random-forest stand-in MLlib offers."""
    n_estimators = int(hp.get("n_estimators", 100))
    max_depth = int(hp.get("max_depth", 0) or 30)
    min_leaf = int(hp.get("min_samples_leaf", 1))
    d = X.shape[1]
    if "max_features" in hp:
        n_feats = max(1, int(hp["max_features"]))
    else:
        n_feats = max(1, int(round(np.sqrt(d)))) if classification else d
    rng = np.random.default_rng(seed)
    idx = np.arange(len(X))
    trees = [
        _ert_build(X, y, idx, max_depth, rng, n_feats, min_leaf, classification)
        for _ in range(n_estimators)
    ]
    out = {
        "kind": "ensemble",
        "mode": "extra_trees_clf" if classification else "extra_trees_reg",
        "trees": trees,
        "weights": [1.0] * len(trees),
    }
    if classification:
        out["classes"] = np.unique(y)
    return out


def _hist_bin_edges(X, max_bins):
    """Per-feature bin edges, midpoints between distinct values when
    the feature has <= max_bins distinct values, else quantile edges —
    the binning sklearn's _BinMapper applies before any boosting."""
    edges = []
    for j in range(X.shape[1]):
        u = np.unique(X[:, j])
        if len(u) <= max_bins:
            e = (u[1:] + u[:-1]) / 2.0
        else:
            e = np.unique(
                np.quantile(X[:, j], np.linspace(0, 1, max_bins + 1)[1:-1])
            )
        edges.append(e)
    return edges


def _hgb_tree(B, X_shape_d, g, h, edges, max_depth, min_leaf, lam):
    """One histogram tree: per node, per feature, accumulate gradient/
    hessian sums PER BIN (np.bincount — the histogram trick), scan the
    <=max_bins candidate cuts vectorized, take the best Newton gain.
    Nodes store the ORIGINAL-space threshold (the bin's upper edge), so
    the fitted tree serves through the ordinary _cart_predict walker."""

    def leaf_val(idx):
        return float(-g[idx].sum() / (h[idx].sum() + lam + 1e-300))

    def build(idx, depth):
        if depth == 0 or len(idx) < 2 * min_leaf:
            return {"leaf": leaf_val(idx)}
        G, H = float(g[idx].sum()), float(h[idx].sum())
        base = G * G / (H + lam + 1e-300)
        best = None
        for j in range(X_shape_d):
            nb = len(edges[j]) + 1
            if nb < 2:
                continue
            bj = B[idx, j]
            cg = np.bincount(bj, weights=g[idx], minlength=nb)
            ch = np.bincount(bj, weights=h[idx], minlength=nb)
            cn = np.bincount(bj, minlength=nb)
            Gl, Hl = np.cumsum(cg)[:-1], np.cumsum(ch)[:-1]
            Nl = np.cumsum(cn)[:-1]
            Gr, Hr, Nr = G - Gl, H - Hl, len(idx) - Nl
            ok = (Nl >= min_leaf) & (Nr >= min_leaf)
            gain = (
                Gl**2 / (Hl + lam + 1e-300)
                + Gr**2 / (Hr + lam + 1e-300)
                - base
            )
            gain = np.where(ok, gain, -np.inf)
            k = int(gain.argmax())
            if gain[k] > 1e-12 and (best is None or gain[k] > best[0]):
                best = (float(gain[k]), j, k)
        if best is None:
            return {"leaf": leaf_val(idx)}
        _, j, k = best
        mask = B[idx, j] <= k
        return {
            "f": j,
            "t": float(edges[j][k]),
            "l": build(idx[mask], depth - 1),
            "r": build(idx[~mask], depth - 1),
        }

    return build(np.arange(len(B)), max_depth)


def _hgb_bin(X, edges):
    # side='left' makes bin(x) <= k exactly equivalent to x <= edges[k],
    # so the binned split and the stored threshold agree on train data.
    return np.column_stack(
        [np.searchsorted(edges[j], X[:, j], side="left") for j in range(X.shape[1])]
    )


def _fit_hist_gb_reg(X, y, hp, seed):
    """HistGradientBoostingRegressor semantics: quantile-bin the
    features once (max_bins), then L2 gradient boosting where every
    split is found by scanning per-bin gradient histograms. Leaf values
    are Newton steps; learning_rate and min_samples_leaf follow the
    sklearn defaults the reference uses (sklearn.py:37-99)."""
    n_iter = int(hp.get("n_estimators", hp.get("max_iter", 100)))
    lr = float(hp.get("learning_rate", 0.1))
    max_depth = int(hp.get("max_depth", 0) or 6)
    min_leaf = int(hp.get("min_samples_leaf", 20))
    max_bins = int(hp.get("max_bins", 255))
    lam = float(hp.get("l2_regularization", 0.0))
    edges = _hist_bin_edges(X, max_bins)
    B = _hgb_bin(X, edges)
    init = float(y.mean())
    pred = np.full(len(y), init)
    ones = np.ones(len(y))
    trees = []
    for _ in range(n_iter):
        g = pred - y  # L2 loss gradient; hessian == 1
        if np.abs(g).max() < 1e-12:
            break
        tree = _hgb_tree(B, X.shape[1], g, ones, edges, max_depth, min_leaf, lam)
        pred += lr * _cart_predict(tree, X)
        trees.append(tree)
    return {"kind": "gbdt", "mode": "reg", "init": init, "lr": lr, "trees": trees}


def _fit_hist_gb_clf(X, y, hp, seed):
    """HistGradientBoostingClassifier: binary via logistic loss on the
    log-odds raw score (grad = p − y, hess = p(1−p), Newton leaves);
    multiclass via one-vs-all binary boosters, argmax of raw scores."""
    classes = np.unique(y)
    if len(classes) > 2:
        boosters = [
            _fit_hist_gb_clf(X, np.where(y == c, 1.0, 0.0), hp, seed)
            for c in classes
        ]
        return {
            "kind": "gbdt",
            "mode": "ova",
            "boosters": boosters,
            "classes": classes,
        }
    n_iter = int(hp.get("n_estimators", hp.get("max_iter", 100)))
    lr = float(hp.get("learning_rate", 0.1))
    max_depth = int(hp.get("max_depth", 0) or 6)
    min_leaf = int(hp.get("min_samples_leaf", 20))
    max_bins = int(hp.get("max_bins", 255))
    lam = float(hp.get("l2_regularization", 0.0))
    t = np.where(y == classes[-1], 1.0, 0.0)
    edges = _hist_bin_edges(X, max_bins)
    B = _hgb_bin(X, edges)
    p0 = min(max(float(t.mean()), 1e-6), 1 - 1e-6)
    init = float(np.log(p0 / (1 - p0)))
    raw = np.full(len(y), init)
    trees = []
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-raw))
        g = p - t
        h = np.maximum(p * (1 - p), 1e-12)
        if np.abs(g).max() < 1e-9:
            break
        tree = _hgb_tree(B, X.shape[1], g, h, edges, max_depth, min_leaf, lam)
        raw += lr * _cart_predict(tree, X)
        trees.append(tree)
    return {
        "kind": "gbdt",
        "mode": "binary",
        "init": init,
        "lr": lr,
        "trees": trees,
        "classes": classes,
    }


def _gbdt_predict_fn(p):
    if p["mode"] == "ova":
        classes = np.asarray(p["classes"], dtype="float64")
        subs = [_gbdt_raw_fn(b) for b in p["boosters"]]

        def fn(X):
            scores = np.column_stack([s(X) for s in subs])
            return classes[scores.argmax(axis=1)]

        return fn
    raw = _gbdt_raw_fn(p)
    if p["mode"] == "reg":
        return raw
    classes = np.asarray(p["classes"], dtype="float64")
    return lambda X: np.where(raw(X) >= 0.0, classes[-1], classes[0])


def _gbdt_raw_fn(p):
    trees, lr, init = p["trees"], float(p["lr"]), float(p["init"])

    def raw(X):
        out = np.full(len(X), init)
        for t in trees:
            out += lr * _cart_predict(t, X)
        return out

    return raw


def _ensemble_predict_fn(p):
    mode = p["mode"]
    # adaboost_ova carries per-class boosters instead of a flat tree
    # list — reading p["trees"] unconditionally crashed every
    # multiclass AdaBoost predict (code-review catch)
    trees = p.get("trees")
    weights = np.asarray(p.get("weights", ()), dtype="float64")
    if mode == "adaboost_binary":
        classes = np.asarray(p["classes"], dtype="float64")

        def fn(X):
            score = np.zeros(len(X))
            for t, a in zip(trees, weights):
                s = np.sign(_cart_predict(t, X))
                s[s == 0] = 1.0
                score += a * s
            return np.where(score >= 0, classes[1], classes[0])

        return fn
    if mode == "adaboost_ova":
        classes = np.asarray(p["classes"], dtype="float64")
        boosters = p["boosters"]

        def fn(X):
            scores = np.zeros((len(X), len(boosters)))
            for ci, b in enumerate(boosters):
                for t, a in zip(b["trees"], b["weights"]):
                    s = np.sign(_cart_predict(t, X))
                    s[s == 0] = 1.0
                    scores[:, ci] += a * s
            return classes[scores.argmax(axis=1)]

        return fn
    if mode == "adaboost_r2":
        # weighted-median combination (Drucker 1997)
        lw = np.log(1.0 / np.maximum(weights, 1e-300))

        def fn(X):
            preds = np.column_stack([_cart_predict(t, X) for t in trees])
            order = np.argsort(preds, axis=1)
            sorted_w = lw[order]
            cum = np.cumsum(sorted_w, axis=1)
            k = (cum >= 0.5 * cum[:, -1:]).argmax(axis=1)
            return preds[np.arange(len(X)), order[np.arange(len(X)), k]]

        return fn
    if mode in ("bagging_reg", "extra_trees_reg"):

        def fn(X):
            return np.mean([_cart_predict(t, X) for t in trees], axis=0)

        return fn
    if mode == "extra_trees_clf":
        classes = np.asarray(p["classes"], dtype="float64")

        def fn(X):
            # ERT leaves store exact class values — a plain majority
            # vote over trees (no nearest-class snapping needed)
            votes = np.zeros((len(X), len(classes)))
            for t in trees:
                pred = _cart_predict(t, X)
                ci = np.abs(pred[:, None] - classes[None, :]).argmin(axis=1)
                votes[np.arange(len(X)), ci] += 1
            return classes[votes.argmax(axis=1)]

        return fn
    if mode == "bagging_clf":
        classes = np.asarray(p["classes"], dtype="float64")

        def fn(X):
            votes = np.zeros((len(X), len(classes)))
            for per_class in trees:  # one estimator = per-class trees
                scores = np.stack(
                    [_cart_predict(t, X) for t in per_class], axis=1
                )
                votes[np.arange(len(X)), scores.argmax(axis=1)] += 1
            return classes[votes.argmax(axis=1)]

        return fn
    raise NotImplementedError(mode)


def _fit_affinity_propagation(X, y, hp, seed, max_iter=500, damping=0.9):
    """Affinity propagation (Frey & Dueck 2007): responsibility/
    availability message passing over the negative-squared-distance
    similarity matrix; preference = median similarity. Damping 0.9:
    0.5 oscillates on symmetric blob data (message-passing limit
    cycles); 0.9 converges to the exemplar-per-cluster fixed point.
    Stops once the exemplar set is stable for 15 iterations. O(n²) —
    bounded by the driver row budget, like the reference's sklearn
    path."""
    n = len(X)
    # _sq_dists is the O(n^2)-memory dot-product form; the broadcast
    # (n, n, d) difference array it replaces is a 20 GB allocation at
    # n=5000, d=100 (code-review catch)
    sq = _sq_dists(X, X)
    S = -sq
    pref_hp = hp.get("preference")
    pref = (
        float(np.median(S[~np.eye(n, dtype=bool)]))
        if pref_hp is None
        # 0 is a meaningful (maximal) preference — 'or' would silently
        # discard it
        else float(pref_hp)
    )
    np.fill_diagonal(S, pref)
    damping = float(hp.get("damping", damping))
    R = np.zeros((n, n))
    A = np.zeros((n, n))
    last: frozenset | None = None
    stable = 0
    for _ in range(max_iter):
        AS = A + S
        idx = AS.argmax(axis=1)
        first = AS[np.arange(n), idx].copy()
        AS[np.arange(n), idx] = -np.inf
        second = AS.max(axis=1)
        R_new = S - first[:, None]
        R_new[np.arange(n), idx] = S[np.arange(n), idx] - second
        R = damping * R + (1 - damping) * R_new
        Rp = np.maximum(R, 0)
        np.fill_diagonal(Rp, R.diagonal())
        A_new = np.minimum(0, Rp.sum(axis=0)[None, :] - Rp)
        np.fill_diagonal(A_new, Rp.sum(axis=0) - Rp.diagonal())
        A = damping * A + (1 - damping) * A_new
        ex = frozenset(np.where((R + A).diagonal() > 0)[0].tolist())
        stable = stable + 1 if (ex and ex == last) else 0
        last = ex
        if stable >= 15:
            break
    exemplars = np.array(sorted(last)) if last else np.array(
        [int(sq.sum(axis=1).argmin())]
    )
    centers = X[exemplars]
    return {"kind": "centers", "centers": centers}


def _fit_mean_shift(X, y, hp, seed, max_iter=300, tol=1e-7):
    """Flat-kernel mean shift; bandwidth defaults to the median
    pairwise distance scaled like sklearn's estimate_bandwidth. Modes
    within one bandwidth merge (deterministic order)."""
    n = len(X)
    dists = np.sqrt(_sq_dists(X, X))
    bw = float(hp.get("bandwidth", 0) or np.quantile(dists[~np.eye(n, dtype=bool)], 0.3))
    pts = X.copy()
    for _ in range(max_iter):
        moved = 0.0
        for i in range(n):
            d = np.sqrt(((X - pts[i]) ** 2).sum(axis=1))
            mask = d <= bw
            new = X[mask].mean(axis=0)
            moved = max(moved, float(np.abs(new - pts[i]).max()))
            pts[i] = new
        if moved < tol:
            break
    # merge converged points into modes (first-come order = deterministic)
    modes: list[np.ndarray] = []
    for p in pts:
        if not any(np.sqrt(((p - m) ** 2).sum()) <= bw / 2 for m in modes):
            modes.append(p)
    return {"kind": "centers", "centers": np.array(modes)}


def _fit_perceptron(X, y, hp, seed, epochs=None):
    """Rosenblatt perceptron; multiclass via one-vs-all score argmax."""
    epochs = int(epochs or hp.get("max_iter", 1000))
    classes = np.unique(y)
    d = X.shape[1]
    W = np.zeros((len(classes), d))
    B = np.zeros(len(classes))
    for ci, cls in enumerate(classes):
        t = np.where(y == cls, 1.0, -1.0)
        w, b = np.zeros(d), 0.0
        for _ in range(epochs):
            mistakes = 0
            for i in range(len(X)):
                if t[i] * (w @ X[i] + b) <= 0.0:
                    w = w + t[i] * X[i]
                    b = b + t[i]
                    mistakes += 1
            if mistakes == 0:
                break
        W[ci], B[ci] = w, b
    return {"kind": "linear_clf", "coef": W, "intercept": B, "classes": classes}


def _fit_pa_classifier(X, y, hp, seed, epochs=20):
    """Passive-aggressive classification (PA-I hinge), one-vs-all."""
    C = float(hp.get("C", 1.0))
    classes = np.unique(y)
    d = X.shape[1]
    W = np.zeros((len(classes), d))
    B = np.zeros(len(classes))
    for ci, cls in enumerate(classes):
        t = np.where(y == cls, 1.0, -1.0)
        w, b = np.zeros(d), 0.0
        for _ in range(epochs):
            for i in range(len(X)):
                loss = max(0.0, 1.0 - t[i] * (w @ X[i] + b))
                if loss > 0.0:
                    tau = min(C, loss / (X[i] @ X[i] + 1.0))
                    w = w + tau * t[i] * X[i]
                    b = b + tau * t[i]
        W[ci], B[ci] = w, b
    return {"kind": "linear_clf", "coef": W, "intercept": B, "classes": classes}


# ---------------------------------------------------------------------------
# The reference-unreachable seven (model.rs:435-441 `todo!`): dbscan,
# knn, optics, spectral, spectral_bi, spectral_co,
# feature_agglomeration. The reference DECLARES these in its algorithm
# enum but its dispatch arm is unreachable — implementing them here
# makes every declared algorithm except transformers executable.
# Serving on NEW rows (these sklearn clusterers are fit_predict-only)
# uses the standard extensions: nearest core point within eps for
# dbscan/optics, nearest labeled training point for the spectral
# family — training-set predictions reproduce the fit labels except on
# CONTESTED border points (within eps of cores from two clusters):
# there, fit assigns by BFS visit order (exactly as sklearn does —
# border assignment is order-dependent in DBSCAN itself) while serving
# picks the nearest core, which may be the other cluster.
# ---------------------------------------------------------------------------


def _sq_dists(A, B):
    """Pairwise squared euclidean distances (n_a, n_b)."""
    return (
        (A**2).sum(axis=1)[:, None]
        + (B**2).sum(axis=1)[None, :]
        - 2.0 * (A @ B.T)
    ).clip(min=0.0)


def _fit_knn(X, y, hp, seed, classification=False):
    """k-nearest-neighbors (exact, brute-force): the model IS the
    training set; prediction is the majority vote (classification) or
    mean (regression) of the k nearest points. Bounded by the driver
    row budget like every driver-fit model; serving is Arrow-batched
    and distributed (the training matrix rides the UDF closure)."""
    k = int(hp.get("n_neighbors", 5))
    out = {
        "kind": "knn",
        "X_train": X,
        "y_train": np.asarray(y, dtype="float64"),
        "k": min(k, len(X)),
        "clf": bool(classification),
    }
    if classification:
        out["classes"] = np.unique(y)
    return out


def _dbscan_core(X, eps, min_samples):
    """Exact DBSCAN (Ester et al. 1996) via the full distance matrix:
    returns (labels with -1 noise, core-point mask)."""
    n = len(X)
    sq = _sq_dists(X, X)
    neigh = sq <= eps * eps
    core = neigh.sum(axis=1) >= min_samples
    labels = np.full(n, -1)
    cid = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        stack = [i]
        labels[i] = cid
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in np.nonzero(neigh[p])[0]:
                if labels[q] == -1:
                    labels[q] = cid
                    stack.append(q)
        cid += 1
    return labels, core


def _fit_dbscan(X, y, hp, seed):
    eps = float(hp.get("eps", 0.5))
    min_samples = int(hp.get("min_samples", 5))
    labels, core = _dbscan_core(X, eps, min_samples)
    return {
        "kind": "dbscan",
        "core_pts": X[core],
        "core_labels": labels[core].astype("float64"),
        "eps": eps,
    }


def _fit_optics(X, y, hp, seed):
    """OPTICS (Ankerst et al. 1999): exact reachability ordering, then
    cluster extraction at a flat eps cut — sklearn's documented
    ``cluster_method='dbscan'`` mode (the default xi-steepness
    extraction is approximated by this flat cut, hence the approx
    tag). Output equals DBSCAN at the extraction eps, with the
    reachability computation bounding eps by ``max_eps``."""
    min_samples = int(hp.get("min_samples", 5))
    max_eps = float(hp.get("max_eps", np.inf))
    eps = float(hp.get("eps", 0.5))
    n = len(X)
    sq = np.sqrt(_sq_dists(X, X))
    core_dist = np.sort(sq, axis=1)[:, min_samples - 1] if n >= min_samples else np.full(n, np.inf)
    core_dist = np.where(core_dist <= max_eps, core_dist, np.inf)
    # reachability ordering (priority expansion)
    reach = np.full(n, np.inf)
    seen = np.zeros(n, dtype=bool)
    order = []
    for start in range(n):
        if seen[start]:
            continue
        seeds = {start}
        while seeds:
            p = min(seeds, key=lambda i: (reach[i], i))
            seeds.discard(p)
            if seen[p]:
                continue
            seen[p] = True
            order.append(p)
            if np.isfinite(core_dist[p]):
                newreach = np.maximum(core_dist[p], sq[p])
                upd = (~seen) & (sq[p] <= max_eps) & (newreach < reach)
                reach[upd] = newreach[upd]
                seeds.update(np.nonzero(upd)[0].tolist())
    # flat-eps extraction over the ordering (ExtractDBSCAN)
    labels = np.full(n, -1)
    cid = -1
    for p in order:
        if reach[p] > eps:
            if core_dist[p] <= eps:
                cid += 1
                labels[p] = cid
        else:
            labels[p] = cid
    core = (core_dist <= eps) & (labels >= 0)
    return {
        "kind": "dbscan",
        "core_pts": X[core],
        "core_labels": labels[core].astype("float64"),
        "eps": eps,
    }


def _kmeanspp_init(P, k, rng):
    """k-means++ seeding (Arthur & Vassilvitskii 2007), deterministic
    given the rng — shared by Lloyd's and the mini-batch variant."""
    n = len(P)
    centers = [P[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(_sq_dists(P, np.asarray(centers)), axis=1)
        tot = d2.sum()
        probs = d2 / tot if tot > 0 else np.full(n, 1.0 / n)
        centers.append(P[rng.choice(n, p=probs)])
    return np.asarray(centers, dtype="float64")


def _np_kmeans(P, k, seed, n_iter=100):
    """Lloyd's algorithm with kmeans++ seeding (deterministic rng)."""
    rng = np.random.default_rng(seed)
    n = len(P)
    k = min(k, n)
    C = _kmeanspp_init(P, k, rng)
    for _ in range(n_iter):
        lab = _sq_dists(P, C).argmin(axis=1)
        newC = np.array(
            [P[lab == j].mean(axis=0) if (lab == j).any() else C[j] for j in range(k)]
        )
        if np.allclose(newC, C):
            break
        C = newC
    return _sq_dists(P, C).argmin(axis=1)


def _fit_spectral(X, y, hp, seed):
    """Spectral clustering (Ng–Jordan–Weiss 2002): RBF affinity,
    symmetric-normalized Laplacian, k smallest eigenvectors,
    row-normalize, k-means on the embedding."""
    k = int(hp.get("n_clusters", hp.get("k", 2)))
    gamma = float(hp.get("gamma", 1.0))
    A = np.exp(-gamma * _sq_dists(X, X))
    np.fill_diagonal(A, 0.0)
    d = A.sum(axis=1).clip(min=1e-12)
    Dm = 1.0 / np.sqrt(d)
    L = np.eye(len(X)) - Dm[:, None] * A * Dm[None, :]
    _, vecs = np.linalg.eigh(L)
    U = vecs[:, :k]
    U = U / np.sqrt((U**2).sum(axis=1)).clip(min=1e-12)[:, None]
    labels = _np_kmeans(U, k, seed)
    return {"kind": "nn_labels", "X_train": X, "labels": labels.astype("float64")}


def _sinkhorn_bistochastic(A, n_iter=200, tol=1e-8):
    """Scale A to (approximately) doubly-stochastic row/col sums by
    alternating row/column normalization (Sinkhorn–Knopp)."""
    r = np.ones(A.shape[0])
    c = np.ones(A.shape[1])
    for _ in range(n_iter):
        r_new = 1.0 / (A @ c).clip(min=1e-12)
        c_new = 1.0 / (A.T @ r_new).clip(min=1e-12)
        if np.abs(r_new - r).max() < tol and np.abs(c_new - c).max() < tol:
            r, c = r_new, c_new
            break
        r, c = r_new, c_new
    return A * np.outer(r, c)


def _spectral_matrix_labels(X, k, seed, bistochastic):
    """Shared core of spectral_co/spectral_bi: normalize the (shifted
    nonnegative) data matrix, SVD, k-means the projected row embedding.
    spectral_co uses Dhillon (2001) D1^-1/2 A D2^-1/2; spectral_bi uses
    Kluger (2003) bistochastization."""
    A = X - X.min() + 1e-9  # bipartite-graph view needs nonnegative entries
    if bistochastic:
        An = _sinkhorn_bistochastic(A)
        d1 = np.ones(A.shape[0])
    else:
        d1 = 1.0 / np.sqrt(A.sum(axis=1).clip(min=1e-12))
        d2 = 1.0 / np.sqrt(A.sum(axis=0).clip(min=1e-12))
        An = d1[:, None] * A * d2[None, :]
    # l = ceil(log2 k) singular vectors, starting at u2 (u1 is the
    # trivial constant direction of the normalized matrix)
    n_sv = max(1, int(np.ceil(np.log2(max(k, 2)))))
    U, _, _ = np.linalg.svd(An, full_matrices=False)
    Z = (d1[:, None] * U[:, 1 : n_sv + 1]) if not bistochastic else U[:, 1 : n_sv + 1]
    if Z.shape[1] == 0:
        Z = U[:, :1]
    return _np_kmeans(Z, k, seed)


def _fit_spectral_co(X, y, hp, seed):
    k = int(hp.get("n_clusters", hp.get("k", 2)))
    labels = _spectral_matrix_labels(X, k, seed, bistochastic=False)
    return {"kind": "nn_labels", "X_train": X, "labels": labels.astype("float64")}


def _fit_spectral_bi(X, y, hp, seed):
    k = int(hp.get("n_clusters", hp.get("k", 2)))
    labels = _spectral_matrix_labels(X, k, seed, bistochastic=True)
    return {"kind": "nn_labels", "X_train": X, "labels": labels.astype("float64")}


def _ward_agglomerate(P, k):
    """Exact Ward agglomerative clustering via the Lance–Williams
    recurrence on the pairwise distance matrix; O(n³) worst case,
    driver-side under the row budget (or feature count for
    feature_agglomeration). Returns integer labels 0..k-1."""
    n = len(P)
    k = max(1, min(k, n))
    D = _sq_dists(P, P)
    size = np.ones(n)
    active = list(range(n))
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    np.fill_diagonal(D, np.inf)
    while len(active) > k:
        sub = D[np.ix_(active, active)]
        flat = int(sub.argmin())
        ai, aj = divmod(flat, len(active))
        if ai > aj:
            ai, aj = aj, ai
        i, j = active[ai], active[aj]
        si, sj = size[i], size[j]
        # Lance-Williams (Ward): d(i∪j, h) update
        for h in active:
            if h in (i, j):
                continue
            sh = size[h]
            D[i, h] = D[h, i] = (
                (si + sh) * D[i, h] + (sj + sh) * D[j, h] - sh * D[i, j]
            ) / (si + sj + sh)
        size[i] = si + sj
        members[i].extend(members.pop(j))
        D[j, :] = D[:, j] = np.inf
        active.remove(j)
    labels = np.empty(n, dtype=int)
    for cid, root in enumerate(sorted(active)):
        labels[members[root]] = cid
    return labels


def _fit_feature_agglomeration(X, y, hp, seed):
    """FeatureAgglomeration: Ward-cluster the FEATURE columns (each
    feature is a point in sample space), then transform pools each
    cluster's features by their mean — a decomposition-task transformer
    like PCA, output dim = n_clusters."""
    k = int(hp.get("n_clusters", hp.get("k", 2)))
    labels = _ward_agglomerate(X.T, k)
    return {"kind": "feature_map", "labels": labels, "k": int(labels.max() + 1)}


def _fit_mini_batch_kmeans(X, y, hp, seed):
    """Mini-batch k-means, the actual Sculley (2010) algorithm the
    reference's sklearn path runs (`sklearn.py:92` MiniBatchKMeans):
    k-means++ init, then per-sample center updates with the
    per-center count-based learning rate eta = 1/c — NOT a Lloyd's
    stand-in. Deterministic given the seed."""
    rng = np.random.default_rng(seed)
    n = len(X)
    k = min(int(hp.get("n_clusters", hp.get("k", 8))), n)
    batch = min(int(hp.get("batch_size", 1024)), n)
    max_iter = int(hp.get("max_iter", 100))
    C = _kmeanspp_init(X, k, rng)
    counts = np.zeros(k)
    for _ in range(max_iter):
        idx = rng.choice(n, size=batch, replace=False)
        B = X[idx]
        lab = _sq_dists(B, C).argmin(axis=1)
        old = C.copy()
        for x, c in zip(B, lab):
            counts[c] += 1.0
            eta = 1.0 / counts[c]
            C[c] = (1.0 - eta) * C[c] + eta * x
        if np.abs(C - old).max() < 1e-6:
            break
    return {"kind": "centers", "centers": C}


def _fit_agglomerative(X, y, hp, seed):
    """AgglomerativeClustering, exact Ward linkage via the existing
    Lance-Williams recurrence (the sklearn default linkage,
    `sklearn.py:87`); serving extends by nearest training point."""
    k = int(hp.get("n_clusters", hp.get("k", 2)))
    labels = _ward_agglomerate(X, k)
    return {"kind": "nn_labels", "X_train": X, "labels": labels.astype("float64")}


def _fit_birch(X, y, hp, seed):
    """BIRCH (Zhang et al. 1996; `sklearn.py:88`): CF-subcluster
    construction by the radius-threshold insertion rule — x joins its
    nearest subcluster iff the merged radius sqrt(SS/n - ||LS/n||^2)
    stays <= threshold, else opens a new subcluster — followed by the
    global phase: Ward-agglomerate the subcluster centroids to
    n_clusters and label each subcluster. The CF tree itself is
    flattened (equivalent to branching_factor >= n_subclusters: the
    tree only routes insertions faster, the radius rule decides the
    granularity). Serving = label of the nearest subcluster centroid,
    exactly sklearn's predict."""
    threshold = float(hp.get("threshold", 0.5))
    k = int(hp.get("n_clusters", hp.get("k", 3)))
    n_cf, ls, ss = [], [], []  # per-subcluster: count, linear sum, squared-norm sum
    for x in X:
        if n_cf:
            cent = np.asarray(ls) / np.asarray(n_cf)[:, None]
            j = int(((cent - x) ** 2).sum(axis=1).argmin())
            nn = n_cf[j] + 1
            nls = ls[j] + x
            nss = ss[j] + float(x @ x)
            r2 = nss / nn - float((nls / nn) @ (nls / nn))
            if r2 <= threshold * threshold:
                n_cf[j], ls[j], ss[j] = nn, nls, nss
                continue
        n_cf.append(1)
        ls.append(x.astype("float64"))
        ss.append(float(x @ x))
    cent = np.asarray(ls) / np.asarray(n_cf)[:, None]
    glob = _ward_agglomerate(cent, min(k, len(cent)))
    return {
        "kind": "nn_labels",
        "X_train": cent,
        "labels": glob.astype("float64"),
    }


# (task, algorithm) -> (fitter, backend tag). "numpy" = same objective as
# the reference's sklearn path; "numpy-approx:*" = documented stand-in.
NUMPY_MAP = {
    (Task.regression, Algorithm.least_angle): (_fit_lars, "numpy"),
    (Task.regression, Algorithm.lasso_least_angle): (_fit_lasso_lars, "numpy"),
    (Task.regression, Algorithm.orthogonal_matching_pursuit): (_fit_omp, "numpy"),
    (Task.regression, Algorithm.bayesian_ridge): (_fit_bayesian_ridge, "numpy"),
    (Task.regression, Algorithm.automatic_relevance_determination): (
        lambda X, y, hp, seed: _fit_bayesian_ridge(X, y, hp, seed, ard=True),
        "numpy",
    ),
    (Task.regression, Algorithm.passive_aggressive): (_fit_pa_regressor, "numpy"),
    (Task.regression, Algorithm.ransac): (_fit_ransac, "numpy"),
    (Task.regression, Algorithm.theil_sen): (_fit_theil_sen, "numpy"),
    (Task.regression, Algorithm.quantile): (_fit_quantile, "numpy-approx:quantile_irls"),
    (Task.regression, Algorithm.kernel_ridge): (_fit_kernel_ridge, "numpy"),
    (Task.regression, Algorithm.gaussian_process): (_fit_gp_regressor, "numpy"),
    (Task.classification, Algorithm.perceptron): (_fit_perceptron, "numpy"),
    (Task.classification, Algorithm.passive_aggressive): (_fit_pa_classifier, "numpy"),
    (Task.regression, Algorithm.stochastic_gradient_descent): (
        _fit_sgd_regressor,
        "numpy",
    ),
    (Task.classification, Algorithm.stochastic_gradient_descent): (
        _fit_sgd_classifier,
        "numpy",
    ),
    (Task.clustering, Algorithm.affinity_propagation): (
        _fit_affinity_propagation,
        "numpy",
    ),
    (Task.clustering, Algorithm.mean_shift): (_fit_mean_shift, "numpy"),
    (Task.regression, Algorithm.ada_boost): (_fit_ada_boost_reg, "numpy"),
    (Task.classification, Algorithm.ada_boost): (_fit_ada_boost_clf, "numpy"),
    (Task.regression, Algorithm.bagging): (_fit_bagging, "numpy"),
    (Task.classification, Algorithm.bagging): (
        lambda X, y, hp, seed: _fit_bagging(X, y, hp, seed, classification=True),
        "numpy",
    ),
    (Task.classification, Algorithm.svm): (_fit_svc, "numpy"),
    (Task.classification, Algorithm.nu_svm): (
        _fit_svc,
        "numpy-approx:nu_svm->c_svm",
    ),
    (Task.regression, Algorithm.svm): (_fit_svr, "numpy"),
    (Task.regression, Algorithm.nu_svm): (
        _fit_svr,
        "numpy-approx:nu_svr->eps_svr",
    ),
    (Task.regression, Algorithm.linear_svm): (_fit_linear_svr, "numpy"),
    # the reference-unreachable seven (model.rs:435-441) — see section
    # comment above; executable here, beyond reference parity
    (Task.classification, Algorithm.knn): (
        lambda X, y, hp, seed: _fit_knn(X, y, hp, seed, classification=True),
        "numpy",
    ),
    (Task.regression, Algorithm.knn): (_fit_knn, "numpy"),
    (Task.clustering, Algorithm.dbscan): (_fit_dbscan, "numpy"),
    (Task.clustering, Algorithm.optics): (
        _fit_optics,
        "numpy-approx:optics->flat_eps_extraction",
    ),
    (Task.clustering, Algorithm.spectral): (_fit_spectral, "numpy"),
    (Task.clustering, Algorithm.spectral_co): (_fit_spectral_co, "numpy"),
    (Task.clustering, Algorithm.spectral_bi): (_fit_spectral_bi, "numpy"),
    (Task.clustering, Algorithm.mini_batch_kmeans): (
        _fit_mini_batch_kmeans,
        "numpy",
    ),
    (Task.clustering, Algorithm.agglomerative): (_fit_agglomerative, "numpy"),
    (Task.clustering, Algorithm.birch): (_fit_birch, "numpy"),
    (Task.decomposition, Algorithm.feature_agglomeration): (
        _fit_feature_agglomeration,
        "numpy",
    ),
    (Task.regression, Algorithm.extra_trees): (_fit_extra_trees, "numpy"),
    (Task.classification, Algorithm.extra_trees): (
        lambda X, y, hp, seed: _fit_extra_trees(X, y, hp, seed, classification=True),
        "numpy",
    ),
    (Task.regression, Algorithm.hist_gradient_boosting): (_fit_hist_gb_reg, "numpy"),
    (Task.classification, Algorithm.hist_gradient_boosting): (
        _fit_hist_gb_clf,
        "numpy",
    ),
    (Task.classification, Algorithm.gaussian_process): (
        _fit_kernel_logistic,
        "numpy-approx:gp_clf->kernel_logistic",
    ),
}


def available(task: Task, algorithm: Algorithm) -> bool:
    return (task, algorithm) in NUMPY_MAP


def backend_tag(task: Task, algorithm: Algorithm) -> str:
    return NUMPY_MAP[(task, algorithm)][1]


class NumpyEstimator:
    """MLlib-shaped estimator: .fit(df with features/label) -> model."""

    def __init__(self, task: Task, algorithm: Algorithm, hyperparams: dict, seed: int):
        self.task = task
        self.algorithm = algorithm
        self.hyperparams = dict(hyperparams or {})
        self.seed = seed

    def fit(self, df: DataFrame) -> "NumpyModel":
        # ONE pass enforces the budget AND fetches the data: collecting
        # at most ROW_BUDGET+1 rows both detects the overrun and avoids
        # running the (possibly expensive) upstream plan twice — the
        # separate count() guard executed the whole plan a second time.
        cols = ["features"] + (["label"] if "label" in df.columns else [])
        pdf = df.select(*cols).limit(ROW_BUDGET + 1).toPandas()
        if len(pdf) > ROW_BUDGET:
            raise ValueError(
                f"numpy backend fits on the driver; the input exceeds the "
                f"QML_NUMPY_ROW_BUDGET ({ROW_BUDGET} rows). Sample the "
                f"relation or use a distributed MLlib algorithm instead."
            )
        X = np.array(pdf["features"].tolist(), dtype="float64")
        y = pdf["label"].to_numpy(dtype="float64") if "label" in pdf else None
        fitter, _ = NUMPY_MAP[(self.task, self.algorithm)]
        params = fitter(X, y, self.hyperparams, self.seed)
        return NumpyModel(self.task, params)


class NumpyModel:
    """MLlib-shaped model: .transform(df) adds a prediction column via an
    Arrow-batched pandas UDF (parameters ride in the UDF closure)."""

    def __init__(self, task: Task, params: dict):
        self.task = task
        self.params = params

    # portable dump → streaming_predict / SQL-UDF serving reuse the
    # existing portable evaluators (predict.py::_portable_predict_fn).
    @property
    def portable(self) -> dict | None:
        p = self.params
        if p["kind"] == "linear":
            return {
                "kind": "linear_regression",
                "coef": np.asarray(p["coef"]).tolist(),
                "intercept": float(p["intercept"]),
            }
        if p["kind"] == "centers":
            # same evaluator shape as MLlib kmeans → SQL-UDF/streaming
            # serving reuse the existing kmeans portable evaluator
            return {
                "kind": "kmeans",
                "centers": np.asarray(p["centers"]).tolist(),
            }
        if p["kind"] == "linear_clf":
            classes = np.asarray(p["classes"])
            # class ids must be the contiguous 0..k-1 label encoding for
            # the argmax/sigmoid portable evaluators to be equivalent
            if np.array_equal(classes, np.arange(len(classes), dtype="float64")):
                coef = np.asarray(p["coef"])
                b = np.asarray(p["intercept"])
                if len(classes) == 2:
                    # sign(w1·x+b1 - w0·x-b0) == argmax — one logistic row
                    return {
                        "kind": "logistic_regression",
                        "coef": [(coef[1] - coef[0]).tolist()],
                        "intercept": [float(b[1] - b[0])],
                        "num_classes": 2,
                    }
                return {
                    "kind": "logistic_regression",
                    "coef": coef.tolist(),
                    "intercept": b.tolist(),
                    "num_classes": len(classes),
                }
        return None

    def _predict_fn(self):
        p = self.params
        if p["kind"] == "linear":
            coef = np.asarray(p["coef"], dtype="float64")
            b = float(p["intercept"])
            return lambda X: X @ coef + b
        if p["kind"] == "linear_clf":
            W = np.asarray(p["coef"], dtype="float64")
            B = np.asarray(p["intercept"], dtype="float64")
            classes = np.asarray(p["classes"], dtype="float64")
            return lambda X: classes[(X @ W.T + B).argmax(axis=1)]
        if p["kind"] == "ensemble":
            fn = _ensemble_predict_fn(p)
            return lambda X: fn(X).astype("float64")
        if p["kind"] == "gbdt":
            fn = _gbdt_predict_fn(p)
            return lambda X: np.asarray(fn(X), dtype="float64")
        if p["kind"] == "svm":
            classes = np.asarray(p["classes"], dtype="float64")
            machines = p["machines"]
            kernel, gamma = p["kernel"], p["gamma"]

            def fn(X):
                scores = np.zeros((len(X), len(machines)))
                for ci, m in enumerate(machines):
                    sv = np.asarray(m["sv"], dtype="float64")
                    coef = np.asarray(m["coef"], dtype="float64")
                    K = _rbf(X, sv, gamma) if kernel == "rbf" else X @ sv.T
                    scores[:, ci] = K @ coef + m["b"]
                if len(classes) == 2:
                    # single machine, positive class = classes[1]
                    return np.where(scores[:, 0] >= 0, classes[1], classes[0])
                return classes[scores.argmax(axis=1)]

            return fn
        if p["kind"] == "centers":
            C = np.asarray(p["centers"], dtype="float64")
            return lambda X: (
                ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            ).astype("float64")
        if p["kind"] == "knn":
            Xt = np.asarray(p["X_train"], dtype="float64")
            yt = np.asarray(p["y_train"], dtype="float64")
            k = int(p["k"])

            def fn(X):
                idx = np.argsort(_sq_dists(X, Xt), axis=1)[:, :k]
                nb = yt[idx]
                if p["clf"]:
                    classes = np.asarray(p["classes"], dtype="float64")
                    votes = (nb[:, :, None] == classes[None, None, :]).sum(axis=1)
                    return classes[votes.argmax(axis=1)]
                return nb.mean(axis=1)

            return fn
        if p["kind"] == "dbscan":
            core = np.asarray(p["core_pts"], dtype="float64")
            core_lab = np.asarray(p["core_labels"], dtype="float64")
            eps = float(p["eps"])

            def fn(X):
                if len(core) == 0:
                    return np.full(len(X), -1.0)
                d = _sq_dists(X, core)
                j = d.argmin(axis=1)
                hit = d[np.arange(len(X)), j] <= eps * eps
                return np.where(hit, core_lab[j], -1.0)

            return fn
        if p["kind"] == "nn_labels":
            Xt = np.asarray(p["X_train"], dtype="float64")
            lab = np.asarray(p["labels"], dtype="float64")
            return lambda X: lab[_sq_dists(X, Xt).argmin(axis=1)]
        if p["kind"] == "kernel":
            Xt = np.asarray(p["X_train"], dtype="float64")
            dual = np.asarray(p["dual"], dtype="float64")
            gamma, kernel, off = p["gamma"], p["kernel"], p["y_offset"]

            def fn(X):
                K = _rbf(X, Xt, gamma) if kernel == "rbf" else X @ Xt.T
                return K @ dual + off

            return fn
        raise NotImplementedError(p["kind"])

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql.types import ArrayType, DoubleType

        if self.params["kind"] == "feature_map":
            # decomposition transformer: pool each feature cluster's
            # columns by mean → array output (PCA's serving shape)
            labels = np.asarray(self.params["labels"], dtype=int)
            k = int(self.params["k"])

            @F.pandas_udf(ArrayType(DoubleType()))
            def _pool(feats: pd.Series) -> pd.Series:
                if not len(feats):
                    return pd.Series([], dtype="object")
                X = np.array(feats.tolist(), dtype="float64")
                out = np.column_stack(
                    [X[:, labels == j].mean(axis=1) for j in range(k)]
                )
                return pd.Series(list(out))

            return df.withColumn("decomposition", _pool(F.col("features")))

        fn = self._predict_fn()

        @F.pandas_udf(DoubleType())
        def _pred(feats: pd.Series) -> pd.Series:
            if not len(feats):
                return pd.Series([], dtype="float64")
            X = np.array(feats.tolist(), dtype="float64")
            return pd.Series(fn(X).astype("float64"))

        return df.withColumn("prediction", _pred(F.col("features")))

    # -- persistence hooks used by TrainedModel ------------------------
    def save_json(self, path: str) -> None:
        import json

        def enc(v):
            if isinstance(v, np.ndarray):
                return v.tolist()
            if isinstance(v, dict):
                return {k: enc(x) for k, x in v.items()}
            if isinstance(v, list):
                return [enc(x) for x in v]
            return v

        with open(path, "w") as f:
            json.dump(
                {
                    "task": self.task.value,
                    "params": {k: enc(v) for k, v in self.params.items()},
                },
                f,
            )

    @classmethod
    def load_json(cls, path: str) -> "NumpyModel":
        import json

        with open(path) as f:
            d = json.load(f)
        params = d["params"]
        for k in (
            "coef", "intercept", "classes", "X_train", "dual", "centers",
            "y_train", "core_pts", "core_labels", "labels",
        ):
            if isinstance(params.get(k), list):
                params[k] = np.asarray(params[k], dtype="float64")
        for m in params.get("machines", []):
            m["sv"] = np.asarray(m["sv"], dtype="float64")
            m["coef"] = np.asarray(m["coef"], dtype="float64")
        for b in params.get("boosters", []):
            if isinstance(b.get("classes"), list):
                b["classes"] = np.asarray(b["classes"], dtype="float64")
        return cls(Task(d["task"]), params)
