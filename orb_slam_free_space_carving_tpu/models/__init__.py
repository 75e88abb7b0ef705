"""Stateful pipeline stages (host FSM orchestrating jitted device kernels)."""
