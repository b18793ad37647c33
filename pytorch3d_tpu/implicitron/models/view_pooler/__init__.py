"""View pooling: sampling + aggregation of source-view features (reference implicitron/models/view_pooler)."""
