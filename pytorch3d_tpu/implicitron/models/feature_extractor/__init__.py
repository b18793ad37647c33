"""Image feature extractors (reference implicitron/models/feature_extractor)."""
