"""Device mesh, shardings, and host-sync collectives."""
