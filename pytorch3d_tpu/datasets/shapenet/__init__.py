"""ShapeNetCore dataset and render helpers (reference datasets/shapenet)."""
