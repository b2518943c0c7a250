"""Training: states, jitted steps, epoch loops."""
