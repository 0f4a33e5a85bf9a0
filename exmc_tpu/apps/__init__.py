"""Demo application domains (reference lib/exmc/poker/, lib/exmc/physics/)."""
