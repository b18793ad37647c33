"""New-view-synthesis evaluation protocol (reference implicitron/evaluation)."""
