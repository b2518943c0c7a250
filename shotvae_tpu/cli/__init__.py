"""CLI drivers mirroring the reference main_*.py argparse surfaces."""
