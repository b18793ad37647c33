"""Model visualization helpers (reference implicitron/models/visualization)."""
