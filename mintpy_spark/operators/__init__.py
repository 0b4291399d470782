"""Engine operators: scan/derive/gap-fill/rollup/regression/diff/etc."""
