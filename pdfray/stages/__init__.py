"""Ray Data stages: callable classes for map_batches actor pools."""
