"""Device-side render ops: vertex transforms, triangle setup, rasterization,
texture sampling, deferred PBR shading, and MSAA resolve.

These replace the reference's GPU pipeline (render pass + graphics pipeline +
GLSL shaders, src/engine/graphics_pipeline.cppm + src/game/shaders/) with
jitted XLA ops and Pallas kernels gridded over framebuffer tiles.
"""
