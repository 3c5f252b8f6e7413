"""SLAM model families: scan matchers, loop detectors, optimizers, pipeline."""
