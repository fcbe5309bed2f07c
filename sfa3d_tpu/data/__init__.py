"""Host-side data layer: dataset readers, padded-tensor batching, synthetic
fixtures. Device-side preprocessing (BEV raster, targets) lives in ops/."""
