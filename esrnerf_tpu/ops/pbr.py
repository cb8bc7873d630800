"""Physically-based rendering functions: BRDFs, hemisphere scattering,
Fibonacci sphere sampling, and the spherical-Gaussian envmap evaluation.

Reference: ``app/utils/pbr/functions.py:6-255``. JAX rewrites keep the exact
formulas; randomness is driven by explicit PRNG keys instead of global
torch state (the reference's ``torch.randn`` inside forward).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def diffuse_scattering(
    key: jax.Array, normal: jnp.ndarray, number: int
) -> jnp.ndarray:
    """Uniform hemisphere directions around ``normal`` via sign-flipped
    Gaussian sphere samples (reference ``functions.py:10-18``).
    Returns [..., number, 3]; not differentiated (the reference wraps it in
    no_grad)."""
    dirs = jax.random.normal(key, (*normal.shape[:-1], number, 3), normal.dtype)
    dirs = normalize(dirs)
    inward = jnp.sum(dirs * normal[..., None, :], axis=-1, keepdims=True) < 0
    return jax.lax.stop_gradient(jnp.where(inward, -dirs, dirs))


def fibonacci_hemisphere(nb_samples: int, up: bool = True) -> np.ndarray:
    """Deterministic Fibonacci-spiral hemisphere directions
    (reference ``functions.py:176-194``, random=False path)."""
    n = 2 * nb_samples
    rn = np.arange(nb_samples, n) if up else np.arange(nb_samples)
    shift = 1.0
    ga = math.pi * (3.0 - math.sqrt(5.0))
    offset = 1.0 / nb_samples
    phi = ga * ((rn + shift) % n)
    cos_theta = ((rn + 0.5) * offset) - 1.0
    sin_theta = np.sqrt(1.0 - cos_theta * cos_theta)
    return np.stack(
        [np.cos(phi) * sin_theta, np.sin(phi) * sin_theta, cos_theta], axis=-1
    ).astype(np.float32)


def fibonacci_sphere(nb_samples: int) -> np.ndarray:
    """Deterministic Fibonacci-spiral sphere directions
    (reference ``functions.py:197-211``)."""
    rn = np.arange(nb_samples)
    shift = 1.0
    ga = math.pi * (3.0 - math.sqrt(5.0))
    offset = 2.0 / nb_samples
    phi = ga * ((rn + shift) % nb_samples)
    cos_theta = ((rn + 0.5) * offset) - 1.0
    sin_theta = np.sqrt(1.0 - cos_theta * cos_theta)
    return np.stack(
        [np.cos(phi) * sin_theta, np.sin(phi) * sin_theta, cos_theta], axis=-1
    ).astype(np.float32)


def diffuse_scattering_fib(normal: jnp.ndarray, number: int) -> jnp.ndarray:
    """Fibonacci hemisphere directions, sign-flipped into the normal's
    hemisphere (reference ``functions.py:21-32``)."""
    base = jnp.asarray(fibonacci_hemisphere(number))  # [number, 3]
    dirs = jnp.broadcast_to(base, (*normal.shape[:-1], number, 3))
    inward = jnp.sum(dirs * normal[..., None, :], axis=-1, keepdims=True) < 0
    return jax.lax.stop_gradient(jnp.where(inward, -dirs, dirs))


def disney_reflection(
    albedo: jnp.ndarray,
    roughness: jnp.ndarray,
    metallic: jnp.ndarray,
    normal: jnp.ndarray,
    win: jnp.ndarray,
    wout: jnp.ndarray,
) -> jnp.ndarray:
    """Disney-style BRDF response — the one the models actually use
    (reference ``functions.py:108-173``; used at ``esrnerf.py:565,889``).

    ``(diffuse + specular) * (n·wi) * 2π`` with SG-normalized D, Schlick F,
    Schlick-GGX V.
    """
    EPS = 1e-7

    h = normalize(win + wout)
    noh = jnp.clip(dot(normal, h), 0.0, None)
    ooh = jnp.clip(dot(wout, h), 0.0, None)
    ion = jnp.clip(dot(win, normal), 0.0, None)
    oon = jnp.clip(dot(wout, normal), 0.0, None)

    fd = (1.0 - metallic) * albedo / math.pi

    r2 = jnp.clip(roughness * roughness, EPS, None)
    D = (1.0 / (r2 * math.pi)) * jnp.exp((2.0 / r2) * (noh - 1.0))

    F0 = 0.04 * (1.0 - metallic) + albedo * metallic
    F = F0 + (1.0 - F0) * ((1.0 - ooh) ** 5)

    def v_schlick_ggx(cos):
        k = ((1.0 + roughness) ** 2) / 8.0
        return 0.5 / jnp.clip(cos * (1.0 - k) + k, EPS, None)

    V = v_schlick_ggx(ion) * v_schlick_ggx(oon)
    fs = D * F * V
    return (fd + fs) * ion * math.pi * 2.0


def micro_reflection(albedo, roughness, normal, win, wout):
    """Microfacet BRDF variant (reference ``functions.py:35-61``; bound but
    unused by the shipped models — kept for config parity)."""
    F0 = 0.04
    h = normalize(win + wout)
    k = roughness**4 / 2.0
    rho = roughness**2

    NoO = dot(normal, wout)
    NoI = dot(normal, win)
    NoH = dot(normal, h)
    HoI = dot(h, win)

    D = rho**2 / (math.pi * (NoH**2 * (rho**2 - 1) + 1) ** 2)
    F = F0 + (1 - F0) * (1 - HoI) ** 5
    G = NoI / ((NoO * (1 - k) + k) * (NoI * (1 - k) + k))
    return D * F * G / 2 * math.pi + NoI * (1 - F) * albedo * 2


def tensoir_reflection(albedo, roughness, normal, win, wout, fresnel: float = 0.04):
    """TensoIR BRDF variant (reference ``functions.py:64-105``; unused by the
    shipped models — kept for config parity)."""
    L = normalize(win)
    V = normalize(wout)
    H = normalize((L + V) / 2.0)
    N = normalize(normal)

    NoV = jnp.sum(V * N, axis=-1, keepdims=True)
    N = N * jnp.sign(NoV)

    NoL = jnp.clip(jnp.sum(N * L, -1, keepdims=True), 1e-6, 1)
    NoV = jnp.clip(jnp.sum(N * V, -1, keepdims=True), 1e-6, 1)
    NoH = jnp.clip(jnp.sum(N * H, -1, keepdims=True), 1e-6, 1)
    VoH = jnp.clip(jnp.sum(V * H, -1, keepdims=True), 1e-6, 1)

    alpha = roughness * roughness
    alpha2 = alpha * alpha
    k = (alpha + 2 * roughness + 1.0) / 8.0
    FMi = ((-5.55473) * VoH - 6.98316) * VoH
    frac0 = fresnel + (1 - fresnel) * jnp.power(2.0, FMi)
    frac = frac0 * alpha2
    nom0 = NoH * NoH * (alpha2 - 1) + 1
    nom1 = NoV * (1 - k) + k
    nom2 = NoL * (1 - k) + k
    nom = jnp.clip(4 * math.pi * nom0 * nom0 * nom1 * nom2, 1e-6, 4 * math.pi)
    spec = frac / nom
    brdf = albedo / math.pi + spec
    return 2 * math.pi * NoL * brdf


def sg_envmap(
    mus: jnp.ndarray,
    lambdas: jnp.ndarray,
    lobes: jnp.ndarray,
    dirs: jnp.ndarray,
    activation=jax.nn.softplus,
) -> jnp.ndarray:
    """Evaluate a spherical-Gaussian mixture envmap at unit directions
    (reference ``pbr/module.py:133-143``).

    mus [K,3], lambdas [K,1], lobes [K,3]; dirs [..., 3] -> [..., 3].
    """
    lobes_n = normalize(lobes)
    lam = jnp.abs(lambdas)
    cos = jnp.sum(dirs[..., None, :] * lobes_n, axis=-1, keepdims=True)  # [...,K,1]
    contrib = mus * jnp.exp(lam * (cos - 1.0))  # [...,K,3]
    return activation(contrib.sum(-2))


def init_sg_params(key: jax.Array, num_sg: int = 48, activation: str = "softplus"):
    """Energy-normalized SG init (reference ``pbr/module.py:86-131``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    mus = jax.random.normal(k1, (num_sg, 3))
    lambdas = 10.0 + jnp.abs(jax.random.normal(k2, (num_sg, 1)) * 20.0)
    lobes = jax.random.normal(k3, (num_sg, 3))

    act = {"softplus": jax.nn.softplus, "relu": jax.nn.relu, "abs": jnp.abs,
           "exp": jnp.exp, "sigmoid": jax.nn.sigmoid}[activation]
    lam = jnp.abs(lambdas)
    energy = act(mus) * 2.0 * math.pi / lam * (1.0 - jnp.exp(-2.0 * lam))
    normalized_mu = act(mus) / energy.sum(0, keepdims=True) * 2.0 * math.pi * 0.8
    if activation in ("abs", "relu"):
        mus = normalized_mu
    elif activation == "softplus":
        mus = jnp.log(jnp.expm1(normalized_mu))
    elif activation == "exp":
        mus = jnp.log(normalized_mu)
    return {"mus": mus, "lambdas": lambdas, "lobes": lobes}
