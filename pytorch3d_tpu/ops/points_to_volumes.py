"""Differentiable point -> voxel splatting.

Parity: reference ops/points_to_volumes.py:191
(`add_pointclouds_to_volumes`), :289
(`add_points_features_to_volume_densities_features`) + csrc/points_to_volumes/
(878 LoC custom fwd/bwd).

TPU design: density and features are packed into one (P*corners, 1+C)
row payload and splatted with a SINGLE row scatter-add into the
flattened (N_vox, 1+C) grid (XLA lowers to one sorted segment sum of
rows, minor-axis contiguous) — replacing the round-4 form's per-corner,
per-channel scalar scatters (1 + C scatters x 8 corners).  Its
transpose (a row gather) is the backward — no custom kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def add_pointclouds_to_volumes(
    pointclouds,
    initial_volumes,
    mode: str = "trilinear",
    min_weight: float = 1e-4,
    rescale_features: bool = True,
):
    """Splat a Pointclouds batch (with features) into Volumes (reference :191)."""
    pts = pointclouds.points_padded()  # (B, P, 3)
    feats = pointclouds.features_padded()
    if feats is None:
        raise ValueError("Pointclouds have to have features.")
    mask = pointclouds.points_padded_mask().astype(pts.dtype)

    pts_local = initial_volumes.world_to_local_coords(pts)
    features, densities = add_points_features_to_volume_densities_features(
        pts_local,
        feats,
        initial_volumes.densities(),
        initial_volumes.features(),
        mode=mode,
        min_weight=min_weight,
        mask=mask,
        rescale_features=rescale_features,
    )
    return initial_volumes.update_padded(
        new_densities=densities, new_features=features
    )


def add_points_features_to_volume_densities_features(
    points_3d: jnp.ndarray,  # (B, P, 3) local coords in [-1, 1]
    points_features: jnp.ndarray,  # (B, P, C)
    volume_densities: jnp.ndarray,  # (B, 1, D, H, W)
    volume_features: Optional[jnp.ndarray],  # (B, C, D, H, W) | None
    mode: str = "trilinear",
    min_weight: float = 1e-4,
    mask: Optional[jnp.ndarray] = None,  # (B, P)
    grid_sizes=None,
    rescale_features: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Splat features/densities (reference :289).

    Returns (features (B, C, D, H, W), densities (B, 1, D, H, W)) —
    the reference's return order (:289).
    """
    B, P, _ = points_3d.shape
    C = points_features.shape[-1]
    _, _, D, H, W = volume_densities.shape
    N_vox = D * H * W
    if volume_features is None:
        volume_features = jnp.zeros(
            (B, C, D, H, W), volume_densities.dtype
        )
    if mask is None:
        mask = jnp.ones((B, P), points_3d.dtype)

    # local [-1, 1] -> voxel coords (x: [0, W-1], align_corners=True)
    x = (points_3d[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (points_3d[..., 1] + 1.0) * 0.5 * (H - 1)
    z = (points_3d[..., 2] + 1.0) * 0.5 * (D - 1)

    def splat_one(xb, yb, zb, fb, mb, dens0, feat0):
        if mode == "nearest":
            corners = [(jnp.round(xb), jnp.round(yb), jnp.round(zb), None)]
        elif mode == "trilinear":
            x0, y0, z0 = jnp.floor(xb), jnp.floor(yb), jnp.floor(zb)
            wx, wy, wz = xb - x0, yb - y0, zb - z0
            corners = []
            for dz, fz in ((0, 1 - wz), (1, wz)):
                for dy, fy in ((0, 1 - wy), (1, wy)):
                    for dx, fx in ((0, 1 - wx), (1, wx)):
                        corners.append(
                            (x0 + dx, y0 + dy, z0 + dz, fx * fy * fz)
                        )
        else:
            raise ValueError('No such interpolation mode "%s"' % mode)

        idx_all, w_all = [], []
        for cx, cy, cz, w in corners:
            w = mb if w is None else w * mb
            inb = (
                (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
                & (cz >= 0) & (cz <= D - 1)
            )
            w_all.append(jnp.where(inb, w, 0.0))
            idx_all.append(
                jnp.clip(cz, 0, D - 1).astype(jnp.int32) * (H * W)
                + jnp.clip(cy, 0, H - 1).astype(jnp.int32) * W
                + jnp.clip(cx, 0, W - 1).astype(jnp.int32)
            )
        idx = jnp.concatenate(idx_all)  # (corners*P,)
        w = jnp.concatenate(w_all)  # (corners*P,)
        # packed rows [density | features]: one scatter-add of
        # (corners*P, 1+C) rows instead of (1+C) scalar scatters/corner
        payload = jnp.concatenate(
            [jnp.ones((fb.shape[0], 1), fb.dtype), fb], axis=-1
        )
        payload = jnp.tile(payload, (len(corners), 1)) * w[:, None]
        acc = jnp.zeros((N_vox, 1 + C), feat0.dtype).at[idx].add(payload)
        dens = dens0.reshape(-1) + acc[:, 0]
        feat = feat0.reshape(C, -1) + acc[:, 1:].T
        return dens.reshape(1, D, H, W), feat.reshape(C, D, H, W)

    dens_out, feat_out = jax.vmap(splat_one)(
        x, y, z, points_features, mask,
        volume_densities, volume_features,
    )
    if rescale_features:
        feat_out = feat_out / jnp.clip(dens_out, min_weight)
    # reference :289 returns (features, densities) in that order
    return feat_out, dens_out
