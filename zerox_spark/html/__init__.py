"""HTML5 tokenizer → DOM array → boilerplate scoring (the engine's analog of
the reference's rasterize+cleanup stage, SURVEY.md §2.2-2.3)."""
