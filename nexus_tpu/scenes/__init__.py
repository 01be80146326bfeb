"""Procedural benchmark scenes (BASELINE.md configs 2-5).

The reference ships only the two Cornell GLBs
(/root/reference/Nexus/assets/demo_scenes); the bunny / stormtrooper /
interior assets its README shows are downloaded by users. With no
network egress, these generators produce stand-ins at the same scale
and feature mix: an OBJ-loaded ~70k-tri smooth blob (config 2), the
glass cornell_box_sphere (config 3, shipped), an instanced + textured +
HDR-environment scene (config 4), and a ~1M-tri interior (config 5).
"""

from nexus_tpu.scenes.procedural import (  # noqa: F401
    blob_mesh,
    bunny_scene,
    checker_texture,
    glass_scene,
    icosphere,
    instanced_env_scene,
    interior_scene,
    procedural_sky,
    write_blob_obj,
)
