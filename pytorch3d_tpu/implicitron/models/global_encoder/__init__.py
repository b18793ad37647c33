"""Global / autodecoder encoders (reference implicitron/models/global_encoder)."""
