"""Data subsystem: Flickr30k prepare flow, dataset, preprocessing, batching."""
