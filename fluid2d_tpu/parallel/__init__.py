"""Grid sharding over TPU device meshes (GSPMD and explicit halo paths)."""
