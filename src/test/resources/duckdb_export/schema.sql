


CREATE TABLE cities(city_id BIGINT, "name" VARCHAR, pop BIGINT);
CREATE TABLE metrics(m_id BIGINT, v DOUBLE);




