"""Optional pygame window for ``render_mode='human'``.

Mirrors the reference's windowed path (`plantos_env_new.py:607-629`):
30 FPS clock, window titled "PlantOS Environment", QUIT handling. pygame is
imported lazily so headless installs never touch SDL.
"""

from __future__ import annotations

import numpy as np


class FrameWindow:
    def __init__(self, size_px: int, caption: str = "PlantOS Environment",
                 fps: int = 30):
        import pygame  # lazy; raises ImportError if unavailable

        self._pygame = pygame
        pygame.init()
        self.window = pygame.display.set_mode((size_px, size_px))
        pygame.display.set_caption(caption)
        self.clock = pygame.time.Clock()
        self.fps = fps
        self.closed = False

    def show(self, frame: np.ndarray) -> None:
        """Blit an HxWx3 uint8 frame; pumps the event queue."""
        pygame = self._pygame
        for event in pygame.event.get():
            if event.type == pygame.QUIT:
                self.close()
                return
        # pygame surfaces are (width, height); frame is (row, col, 3)
        surf = pygame.surfarray.make_surface(np.transpose(frame, (1, 0, 2)))
        self.window.blit(surf, (0, 0))
        pygame.display.flip()
        self.clock.tick(self.fps)

    def close(self) -> None:
        if not self.closed:
            self._pygame.quit()
            self.closed = True
