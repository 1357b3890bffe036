"""Host data layer: parsing, featurization, datasets, padded containers."""
