"""functions subpackage (filled in during the build; see SURVEY.md §7)."""
