"""Chinook testdata subset for the CLI's ``testdata`` command.

The reference CLI's ``testdata`` command replays a bundled Chinook
script (cli/src/testdata.sql — "Modified data from the Chinook
Database", Luis Rocha, codeplex license) creating Album / Artist /
Genre / MediaType / Track and inserting the full dataset. This is a
representative subset with the same schema (including the reference's
inline ``-- todo`` comment, which exercises comment handling in DDL)
so the Usage.md session transcript replays end-to-end: the
album/artist join, the genre correlated-subquery aggregate, and
EXPLAIN all run against it. Chinook is public sample data; rows here
are the well-known first entries of each table.
"""

from __future__ import annotations

CHINOOK_SCRIPT = """
-- Subset of the Chinook sample database (see module docstring).

CREATE TABLE Album
(
    AlbumId U32,
    Title STRING,
    ArtistId U32
);

CREATE TABLE Artist
(
    ArtistId U32,
    Name STRING
);

CREATE TABLE Genre
(
    GenreId U32,
    Name STRING
);

CREATE TABLE MediaType
(
    MediaTypeId U32,
    Name STRING
);

CREATE TABLE Track
(
    TrackId U32,
    Name STRING,
    AlbumId U32,
    MediaTypeId U32,
    GenreId U32,
    Composer STRING,    -- todo: make nullable
    Milliseconds U32,
    Bytes U32,
    UnitPrice F64
);

INSERT INTO Genre (GenreId, Name) VALUES (1, 'Rock'),
(2, 'Jazz'),
(3, 'Metal'),
(4, 'Alternative & Punk'),
(6, 'Blues');

INSERT INTO MediaType (MediaTypeId, Name) VALUES
(1, 'MPEG audio file'),
(2, 'Protected AAC audio file');

INSERT INTO Artist (ArtistId, Name) VALUES (1, 'AC/DC'),
(2, 'Accept'),
(3, 'Aerosmith'),
(4, 'Alanis Morissette'),
(5, 'Alice In Chains');

INSERT INTO Album (AlbumId, Title, ArtistId) VALUES
(1, 'For Those About To Rock We Salute You', 1),
(2, 'Balls to the Wall', 2),
(3, 'Restless and Wild', 2),
(4, 'Let There Be Rock', 1),
(5, 'Big Ones', 3),
(6, 'Jagged Little Pill', 4),
(7, 'Facelift', 5);

INSERT INTO Track (TrackId, Name, AlbumId, MediaTypeId, GenreId,
                   Composer, Milliseconds, Bytes, UnitPrice) VALUES
(1, 'For Those About To Rock (We Salute You)', 1, 1, 1,
 'Angus Young, Malcolm Young, Brian Johnson', 343719, 11170334, 0.99),
(2, 'Balls to the Wall', 2, 2, 1, 'U. Dirkschneider', 342562, 5510424, 0.99),
(3, 'Fast As a Shark', 3, 2, 1, 'F. Baltes', 230619, 3990994, 0.99),
(4, 'Restless and Wild', 3, 2, 1, 'F. Baltes', 252051, 4331779, 0.99),
(5, 'Princess of the Dawn', 3, 2, 1, 'Deaffy', 375418, 6290521, 0.99),
(6, 'Put The Finger On You', 1, 1, 1, 'Angus Young', 205662, 6713451, 0.99),
(7, 'Walk On Water', 5, 1, 1, 'Steven Tyler', 295680, 9719579, 0.99),
(8, 'You Oughta Know', 6, 1, 4, 'Alanis Morissette', 249234, 8196916, 0.99),
(9, 'We Die Young', 7, 1, 3, 'Jerry Cantrell', 152084, 4925362, 0.99),
(10, 'Man In The Box', 7, 1, 3, 'Jerry Cantrell', 286641, 9310272, 0.99);
"""


def load_chinook(db) -> int:
    """Replay the Chinook subset through a LlamaSession; returns the
    number of statements executed (reference: testdata command)."""
    return db.execute_script(CHINOOK_SCRIPT)
