"""Device-mesh parallelism: sharding specs and parallel step builders."""
